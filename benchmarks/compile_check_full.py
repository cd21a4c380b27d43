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
                   choices=["all", "train", "boxes", "decode", "quant"])
    p.add_argument("--batch", default=1, type=int)
    p.add_argument("--llama_layers", default=None, type=int,
                   help="reduce LLM depth (full width) — the single-chip "
                        "train check needs this: 8.4B bf16 params alone "
                        "exceed one v5e's 15.75GB HBM, so full-depth "
                        "training requires the TP/DP mesh")
    args = p.parse_args()

    import dataclasses
    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import GroveModel

    cfg = GroveConfig()          # full size
    if args.llama_layers:
        cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama,
                                           num_layers=args.llama_layers))
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
    # serve in bf16 (fp32 params would be 33.7 GB; flax compute dtype is
    # independent of param storage dtype)
    var_shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, jnp.bfloat16)
        if a.dtype == jnp.float32 else a, var_shapes)
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
        # per-part compilation mirrors the real inference structure (each
        # stage is its own jit launch); the monolithic graph exceeds the
        # axon relay's compile-request limits in this environment
        print("compiling inference stages...", flush=True)
        check("encode_video",
              lambda v, f: model.apply(v, f,
                                       method=GroveModel.encode_video)[0],
              var_shapes, batch_avals["frames_clip"])
        check("encode_grounding",
              lambda v, f: model.apply(v, f,
                                       method=GroveModel.encode_grounding),
              var_shapes, batch_avals["frames_sam"])
        check("lm_forward",
              lambda v, i, ve, s: model.apply(
                  v, i, ve, s, method=GroveModel.lm_forward)[1],
              var_shapes, batch_avals["input_ids"],
              jax.ShapeDtypeStruct((b, nv, cfg.llama.hidden_size),
                                   jnp.bfloat16),
              batch_avals["video_start"])
        g2 = cfg.sam_enc.grid ** 2
        check("ground",
              lambda v, h, d, e: model.apply(
                  v, h, d, e, method=GroveModel.ground)[0],
              var_shapes,
              jax.ShapeDtypeStruct((b, L, cfg.llama.hidden_size),
                                   jnp.bfloat16),
              batch_avals["det_positions"],
              jax.ShapeDtypeStruct((b * t, g2, cfg.sam_dec.embed_dim),
                                   jnp.bfloat16))

    if args.part in ("all", "train"):
        print("compiling forward_train + grad (fine-tune recipe: grads for "
              "the trainable subtree only)...", flush=True)
        from grove_tpu.train.step import (OptimizerConfig, combine_params,
                                          partition_params, trainable_mask)
        mask = trainable_mask(var_shapes["params"], OptimizerConfig())
        t_avals, f_avals = partition_params(var_shapes["params"], mask)
        n_train = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(t_avals))
        print(f"  trainable: {n_train/1e9:.2f}B of {n_params/1e9:.2f}B",
              flush=True)

        def loss_fn(trainable, frozen, bt):
            params = combine_params(trainable, frozen)
            out = model.apply({"params": params}, bt,
                              method=GroveModel.forward_train)
            return out["loss"]

        check("train_grad",
              lambda t_, f_, bt: jax.grad(loss_fn)(t_, f_, bt),
              t_avals, f_avals, batch_avals)

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

    if args.part in ("all", "quant"):
        # single-chip serving claim: with weight-only int8 on the LLM the
        # FULL model's parameter bytes fit one v5e chip (15.75 GB HBM) —
        # bf16 (16.8 GB) does not
        print("compiling int8-weight (single-chip serving) stages...",
              flush=True)
        qcfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama, weight_quant=True))
        qmodel = GroveModel(qcfg, dtype=jnp.bfloat16)
        qvar_shapes = jax.eval_shape(
            lambda r, bt: qmodel.init(r, bt, method=GroveModel.init_all),
            jax.random.PRNGKey(0), batch_avals)
        qvar_shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, jnp.bfloat16)
            if a.dtype == jnp.float32 and a.ndim > 1 else a, qvar_shapes)
        qbytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                     for x in jax.tree.leaves(qvar_shapes["params"]))
        print(f"  int8-LLM param bytes: {qbytes/1e9:.2f} GB "
              f"(vs {2*n_params/1e9:.2f} GB bf16; v5e HBM 15.75 GB)",
              flush=True)
        assert qbytes < 15.75e9, qbytes
        check("lm_forward[int8-w]",
              lambda v, i, ve, s: qmodel.apply(
                  v, i, ve, s, method=GroveModel.lm_forward)[1],
              qvar_shapes, batch_avals["input_ids"],
              jax.ShapeDtypeStruct((b, nv, cfg.llama.hidden_size),
                                   jnp.bfloat16),
              batch_avals["video_start"])
        from grove_tpu.models.llama import init_kv_caches
        cache_avals = jax.eval_shape(
            lambda: init_kv_caches(cfg.llama, b, L + 64, jnp.bfloat16))
        tok = jax.ShapeDtypeStruct((b, 1), jnp.int32)
        check("decode_step[int8-w]",
              lambda v, tk, cc: qmodel.apply(v, tk, L, cc,
                                             method=GroveModel.decode_step),
              qvar_shapes, tok, cache_avals)

    print("ALL COMPILE CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
