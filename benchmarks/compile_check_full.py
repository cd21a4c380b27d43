"""AOT compile check at FULL scale (LLaMA-7B + CLIP-L/336 + SAM-H/512).

Weights never materialize (abstract avals + jit.lower().compile()), so this
validates that the real-size graphs compile for the TPU backend — shapes,
VMEM budgets, kernel lowering — without the multi-GB upload.

Run: python benchmarks/compile_check_full.py [--part all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--part", default="all",
                   choices=["all", "train", "boxes", "decode"])
    p.add_argument("--batch", default=1, type=int)
    args = p.parse_args()

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import GroveModel

    cfg = GroveConfig()          # full size
    model = GroveModel(cfg, dtype=jnp.bfloat16, remat=True)
    b = args.batch
    t = cfg.num_frames
    nv = cfg.num_video_tokens
    L = nv + 128

    batch_avals = {
        "frames_clip": jax.ShapeDtypeStruct(
            (b, t, cfg.clip.image_size, cfg.clip.image_size, 3),
            jnp.bfloat16),
        "frames_sam": jax.ShapeDtypeStruct(
            (b, t, cfg.sam_enc.img_size, cfg.sam_enc.img_size, 3),
            jnp.bfloat16),
        "input_ids": jax.ShapeDtypeStruct((b, L), jnp.int32),
        "video_start": jax.ShapeDtypeStruct((b,), jnp.int32),
        "labels": jax.ShapeDtypeStruct((b, L), jnp.int32),
        "det_positions": jax.ShapeDtypeStruct((b, cfg.max_phrases),
                                              jnp.int32),
        "phrase_mask": jax.ShapeDtypeStruct((b, cfg.max_phrases),
                                            jnp.float32),
        "gt_boxes": jax.ShapeDtypeStruct((b, t, cfg.max_phrases, 4),
                                         jnp.float32),
        "gt_objectness": jax.ShapeDtypeStruct((b, t, cfg.max_phrases),
                                              jnp.float32),
    }

    print("deriving full-size param avals (eval_shape)...", flush=True)
    t0 = time.time()
    var_shapes = jax.eval_shape(
        lambda r, bt: model.init(r, bt, method=GroveModel.init_all),
        jax.random.PRNGKey(0), batch_avals)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(
        var_shapes["params"]))
    print(f"  {n_params/1e9:.2f}B params ({time.time()-t0:.0f}s)",
          flush=True)

    def check(name, fn, *avals):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*avals)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", 0) or 0
        argb = getattr(mem, "argument_size_in_bytes", 0) or 0
        print(f"  {name}: compiled in {time.time()-t0:.0f}s "
              f"(temp {peak/1e9:.2f} GB, args {argb/1e9:.2f} GB)",
              flush=True)

    if args.part in ("all", "boxes"):
        print("compiling forward_boxes (full inference pass)...", flush=True)
        check("forward_boxes",
              lambda v, bt: model.apply(v, bt,
                                        method=GroveModel.forward_boxes),
              var_shapes, batch_avals)

    if args.part in ("all", "train"):
        print("compiling forward_train + grad (train step core)...",
              flush=True)

        def loss_fn(params, bt):
            out = model.apply({"params": params}, bt,
                              method=GroveModel.forward_train)
            return out["loss"]

        check("train_grad",
              lambda v, bt: jax.grad(loss_fn)(v["params"], bt),
              var_shapes, batch_avals)

    if args.part in ("all", "decode"):
        print("compiling decode_step at full cache...", flush=True)
        from grove_tpu.models.llama import init_kv_caches
        cache_avals = jax.eval_shape(
            lambda: init_kv_caches(cfg.llama, b, L + 64, jnp.bfloat16))
        tok = jax.ShapeDtypeStruct((b, 1), jnp.int32)
        check("decode_step",
              lambda v, tk, cc: model.apply(v, tk, L, cc,
                                            method=GroveModel.decode_step),
              var_shapes, tok, cache_avals)

    print("ALL COMPILE CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
