"""Component-level benchmarks: per-module times on the current backend.

Times each hot component with the loop INSIDE one jit (the axon relay makes
per-launch timing meaningless otherwise) and prints a JSON report. Used to
track kernel/regression wins between rounds; `bench.py` remains the one-line
end-to-end metric.

Run: python benchmarks/components.py [--model_size small] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=10):
    """One jit launch running `iters` carry-chained iterations (see
    benchmarks/_timing.py: the naive loop-invariant body gets hoisted by
    XLA and under-reports)."""
    from _timing import timed_loop
    return timed_loop(fn, *args, iters=iters)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_size", default="small",
                   choices=["tiny", "small", "full"])
    p.add_argument("--iters", default=10, type=int)
    p.add_argument("--batch", default=1, type=int)
    p.add_argument("--output", default=None)
    args = p.parse_args()

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import GroveModel, init_grove_params
    from grove_tpu.models.llama import init_kv_caches
    from grove_tpu.train.step import (OptimizerConfig, make_optimizer,
                                      make_train_step)

    cfg = {"tiny": GroveConfig.tiny, "small": GroveConfig.small,
           "full": GroveConfig}[args.model_size]()
    b = args.batch
    dtype = jnp.bfloat16
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=dtype, batch=b)
    params = variables["params"]
    rng = np.random.default_rng(0)
    t = cfg.num_frames
    nv = cfg.num_video_tokens
    L = nv + 48

    fc = jnp.asarray(rng.normal(size=(b, t, cfg.clip.image_size,
                                      cfg.clip.image_size, 3)), dtype)
    fs = jnp.asarray(rng.normal(size=(b, t, cfg.sam_enc.img_size,
                                      cfg.sam_enc.img_size, 3)), dtype)
    ids = rng.integers(3, cfg.llama.vocab_size, size=(b, L)).astype(np.int32)
    ids[:, 2:2 + nv] = 0
    ids[:, -2] = cfg.tokens.det
    ids_j = jnp.asarray(ids)
    vs = jnp.full((b,), 2, jnp.int32)
    ve = jnp.asarray(rng.normal(size=(b, nv, cfg.llama.hidden_size)), dtype)
    det = jnp.full((b, cfg.max_phrases), L - 3, jnp.int32)

    report = {}

    report["clip_encode_ms"] = timed(
        lambda p, f: model.apply({"params": p}, f,
                                 method=GroveModel.encode_video)[0],
        params, fc, iters=args.iters) * 1e3
    report["sam_encode_ms"] = timed(
        lambda p, f: model.apply({"params": p}, f,
                                 method=GroveModel.encode_grounding),
        params, fs, iters=args.iters) * 1e3
    report["lm_forward_ms"] = timed(
        lambda p, i, v, s: model.apply({"params": p}, i, v, s,
                                       method=GroveModel.lm_forward)[1],
        params, ids_j, ve, vs, iters=args.iters) * 1e3

    ie = model.apply({"params": params}, fs,
                     method=GroveModel.encode_grounding)
    hidden = jnp.asarray(rng.normal(size=(b, L, cfg.llama.hidden_size)),
                         dtype)
    report["ground_ms"] = timed(
        lambda p, h, d, e: model.apply({"params": p}, h, d, e,
                                       method=GroveModel.ground)[0],
        params, hidden, det, ie, iters=args.iters) * 1e3

    # one decode step at full cache length
    caches = init_kv_caches(cfg.llama, b, L + 64, dtype=dtype)
    tok = jnp.zeros((b, 1), jnp.int32)
    report["decode_step_ms"] = timed(
        lambda p, tk, cc: model.apply({"params": p}, tk, L, cc,
                                      method=GroveModel.decode_step)[1],
        params, tok, caches, iters=args.iters) * 1e3

    # decode step with the int8 KV cache (fused Pallas dequant kernel)
    caches8 = init_kv_caches(cfg.llama, b, L + 64, dtype=jnp.int8)
    report["decode_step_int8_kv_ms"] = timed(
        lambda p, tk, cc: model.apply({"params": p}, tk, L, cc,
                                      method=GroveModel.decode_step)[1],
        params, tok, caches8, iters=args.iters) * 1e3

    # decode step with weight-only int8 LLM (single-chip serving mode)
    import dataclasses
    from grove_tpu.ops.quant import quantize_llama_tree
    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant=True))
    qmodel = GroveModel(qcfg, dtype=dtype)
    qparams = quantize_llama_tree(params)
    report["decode_step_int8_w_ms"] = timed(
        lambda p, tk, cc: qmodel.apply({"params": p}, tk, L, cc,
                                       method=GroveModel.decode_step)[1],
        qparams, tok, caches, iters=args.iters) * 1e3

    # train step (forward+backward+update), reference freeze policy
    from grove_tpu.train.step import partition_params, trainable_mask
    opt_cfg = OptimizerConfig(total_steps=100)
    opt = make_optimizer(params, opt_cfg)
    mask = trainable_mask(params, opt_cfg)
    trainable, frozen = partition_params(params, mask)
    opt_state = opt.init(trainable)
    step = make_train_step(model, opt)
    batch = {
        "frames_clip": fc, "frames_sam": fs, "input_ids": ids_j,
        "video_start": vs,
        "labels": jnp.asarray(np.where(rng.uniform(size=(b, L)) < 0.5, ids,
                                       -100).astype(np.int32)),
        "det_positions": det,
        "phrase_mask": jnp.ones((b, cfg.max_phrases), jnp.float32),
        "gt_boxes": jnp.asarray(rng.uniform(
            0.3, 0.6, size=(b, t, cfg.max_phrases, 4)).astype(np.float32)),
        "gt_objectness": jnp.ones((b, t, cfg.max_phrases), jnp.float32),
    }

    jit_step = jax.jit(step)
    out = jit_step(trainable, frozen, opt_state, batch)
    _ = np.asarray(out[2]["loss"])
    t0 = time.time()
    n = max(args.iters // 2, 2)
    p_, o_ = trainable, opt_state
    for _ in range(n):
        p_, o_, m = jit_step(p_, frozen, o_, batch)
    _ = np.asarray(m["loss"])
    report["train_step_ms"] = (time.time() - t0) / n * 1e3

    report = {k: round(v, 3) for k, v in report.items()}
    report["model_size"] = args.model_size
    report["batch"] = b
    report["backend"] = jax.default_backend()
    print(json.dumps(report))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
