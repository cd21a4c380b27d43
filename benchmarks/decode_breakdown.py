"""Full-scale decode-step breakdown: where the slack is.

At batch 8 the measured int4 decode step is ~17 ms vs a ~10 ms analytic
floor (projections at their measured in-situ rate + int8-KV attention +
lm_head). This isolates each component with the carry-chained harness to
locate the missing milliseconds.

Run: python benchmarks/decode_breakdown.py [--batch 8] [--ctx 752]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import fetch, timed_loop  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--ctx", default=768, type=int,
                   help="KV capacity (prompt 688 + 64 new, rounded to "
                        "the kernel's 128-lane requirement)")
    p.add_argument("--int8_kv", action="store_true", default=True)
    p.add_argument("--bits", default=4, type=int, choices=[4, 8])
    args = p.parse_args()

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import GroveModel, init_grove_params
    from grove_tpu.models.llama import init_kv_caches
    from grove_tpu.ops.quant import quantize_kernel_int4

    b, C = args.batch, args.ctx
    cfg = GroveConfig()
    cfg = dataclasses.replace(cfg, llama=dataclasses.replace(
        cfg.llama, weight_quant=True, weight_quant_bits=args.bits))
    lcfg = cfg.llama
    d, inter, nl = lcfg.hidden_size, lcfg.intermediate_size, lcfg.num_layers
    report = {"batch": b, "ctx": C, "bits": args.bits}

    rng = np.random.default_rng(0)
    results = {}

    # ---- 1. projection stack (nl layers x 7 matmuls) ----
    if args.bits == 4:
        from grove_tpu.ops.int4_matmul import int4_matmul

        def mk(k, n):
            w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
            q, s = quantize_kernel_int4(w, group=128)
            return jnp.asarray(q), jnp.asarray(s)

        qkv = [mk(d, d) for _ in range(3)]
        o = mk(d, d)
        gate, up = mk(d, inter), mk(d, inter)
        down = mk(inter, d)

        def layer_proj(x):
            h = sum(int4_matmul(x, q, s, block_m=8) for q, s in qkv)
            h = int4_matmul(h, *o, block_m=8)
            a = (int4_matmul(h, *gate, block_m=8)
                 * int4_matmul(h, *up, block_m=8))
            return int4_matmul(a, *down, block_m=8)

        wbytes = (4 * d * d // 2 + 2 * d * inter // 2 + inter * d // 2
                  + (4 * (d // 128) * d + 2 * (d // 128) * inter
                     + (inter // 128) * d) * 4)
    else:
        def mk8(k, n):
            return (jnp.asarray(rng.integers(-127, 127, size=(k, n)),
                                jnp.int8),
                    jnp.asarray(np.ones(n, np.float32) * 0.01))

        qkv = [mk8(d, d) for _ in range(3)]
        o = mk8(d, d)
        gate, up = mk8(d, inter), mk8(d, inter)
        down = mk8(inter, d)

        def dot8(x, w, s):
            return (x @ w.astype(x.dtype)) * s.astype(x.dtype)

        def layer_proj(x):
            h = sum(dot8(x, w, s) for w, s in qkv)
            h = dot8(h, *o)
            a = dot8(h, *gate) * dot8(h, *up)
            return dot8(a, *down)

        wbytes = 4 * d * d + 2 * d * inter + inter * d

    def proj32(x):
        for _ in range(nl):
            x = layer_proj(x) * 1e-3 + x
        return x

    x0 = jax.jit(lambda: jnp.ones((b, d), jnp.bfloat16))()
    secs = timed_loop(proj32, x0, iters=3, perturb=0, extra=30, repeats=3)
    results["proj_stack_ms"] = round(secs * 1e3, 2)
    results["proj_stack_gbs"] = round(nl * wbytes / secs / 1e9, 1)
    print(f"proj stack x{nl}: {secs*1e3:.2f} ms "
          f"({results['proj_stack_gbs']} GB/s)", flush=True)

    # ---- 2. int8-KV attention x nl layers ----
    from grove_tpu.ops.decode_attention import int8_cache_decode_attention
    hkv, hd = lcfg.num_kv_heads, lcfg.head_dim
    nh = lcfg.num_heads
    q = jax.jit(lambda: jnp.ones((b, nh, hd), jnp.bfloat16))()
    # row-major (B, Hkv, C, D) slab — the DUS-friendly layout the kernel
    # takes since the lane-offset rewrite (ops/decode_attention.py)
    ck = jnp.asarray(rng.integers(-127, 127, size=(b, hkv, C, hd)),
                     jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 127, size=(b, hkv, C, hd)),
                     jnp.int8)
    cks = jax.jit(lambda: jnp.ones((b, hkv, C), jnp.bfloat16) * 0.01)()
    cvs = jax.jit(lambda: jnp.ones((b, hkv, C), jnp.bfloat16) * 0.01)()
    bias = jax.jit(lambda: jnp.zeros((b, C), jnp.float32))()

    def attn_stack(q):
        out = q
        for _ in range(nl):
            out = int8_cache_decode_attention(
                out, ck, cv, cks, cvs, bias) * 1e-3 + q
        return out

    secs = timed_loop(attn_stack, q, iters=3, perturb=0, extra=30,
                      repeats=3)
    abytes = nl * (2 * b * hkv * hd * C)   # int8 K + V slabs
    results["attn_stack_ms"] = round(secs * 1e3, 2)
    results["attn_stack_gbs"] = round(abytes / secs / 1e9, 1)
    print(f"attn stack x{nl} (C={C}): {secs*1e3:.2f} ms "
          f"({results['attn_stack_gbs']} GB/s)", flush=True)

    # ---- 3. lm_head int8 ----
    v = lcfg.padded_vocab_size
    wlm = jnp.asarray(rng.integers(-127, 127, size=(d, v)), jnp.int8)
    slm = jax.jit(lambda: jnp.ones((v,), jnp.float32) * 0.01)()
    xh = jax.jit(lambda: jnp.ones((b, d), jnp.bfloat16))()

    def lm(x):
        return (x @ wlm.astype(x.dtype)) * slm.astype(x.dtype)

    secs = timed_loop(lm, xh, iters=3, perturb=0, extra=60, repeats=3)
    results["lm_head_ms"] = round(secs * 1e3, 3)
    results["lm_head_gbs"] = round(d * v / secs / 1e9, 1)
    print(f"lm_head: {secs*1e3:.3f} ms ({results['lm_head_gbs']} GB/s)",
          flush=True)

    # ---- 4. the REAL model decode_step (zeros weights; same compute) ----
    print("building full model for real decode_step...", flush=True)
    shapes = jax.eval_shape(
        lambda r: init_grove_params(cfg, r, dtype=jnp.bfloat16,
                                    batch=1)[1]["params"],
        jax.random.PRNGKey(0))
    tgt = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, jnp.bfloat16
            if a.dtype == jnp.float32 and len(a.shape) > 1 else a.dtype),
        shapes)
    params = jax.jit(lambda: jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype), tgt))()
    model = GroveModel(cfg, dtype=jnp.bfloat16)
    kv_dtype = jnp.int8 if args.int8_kv else jnp.bfloat16
    caches = init_kv_caches(lcfg, b, C, dtype=kv_dtype)
    tok = jax.jit(lambda: jnp.ones((b, 1), jnp.int32))()

    def step(params, tok, caches):
        hidden, logits, caches = model.apply(
            {"params": params}, tok, C - 32, caches,
            method=GroveModel.decode_step)
        nt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return nt[:, None], caches

    # slope over INNER chained steps: tok_{i+1} = argmax(step_i) is a
    # structural data dependency, so no step can hoist; two inner counts
    # in one-jit-each cancel launch overhead (timed_loop's arg
    # perturbation can't apply — tok is int, and perturbing one param
    # leaf would let earlier layers hoist)
    import time as _time

    def make_chain(n):
        @jax.jit
        def chain(params, tok, caches):
            t, c = tok, caches
            for _ in range(n):
                t, c = step(params, t, c)
            return t
        return chain

    lo_n, hi_n = 4, 12
    c_lo, c_hi = make_chain(lo_n), make_chain(hi_n)
    fetch(c_lo(params, tok, caches)); fetch(c_hi(params, tok, caches))
    t_lo = t_hi = None
    for _ in range(3):
        t0 = _time.time(); fetch(c_lo(params, tok, caches))
        t = _time.time() - t0
        t_lo = t if t_lo is None else min(t_lo, t)
        t0 = _time.time(); fetch(c_hi(params, tok, caches))
        t = _time.time() - t0
        t_hi = t if t_hi is None else min(t_hi, t)
    secs = (t_hi - t_lo) / (hi_n - lo_n)
    results["real_decode_step_ms"] = round(secs * 1e3, 2)
    print(f"real decode_step: {secs*1e3:.2f} ms", flush=True)

    parts = (results["proj_stack_ms"] + results["attn_stack_ms"]
             + results["lm_head_ms"])
    results["sum_parts_ms"] = round(parts, 2)
    results["slack_ms"] = round(results["real_decode_step_ms"] - parts, 2)
    print(f"sum of parts {parts:.2f} ms -> slack "
          f"{results['slack_ms']:.2f} ms", flush=True)

    report.update(results)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "decode_breakdown.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
