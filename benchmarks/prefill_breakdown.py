"""Full-scale LLM prefill breakdown: why b16 runs at ~180 TF/s vs b4's 257.

The b16 flagship bench (BENCH_FULL_B16_INT4_STATIC.json) shows lm_prefill
at 731 ms where linear scaling from the b4 all-int8 number predicts ~512
+ the int4 view cost. This tool isolates the bare LlamaModel (no vision
towers, no grove glue) at reference scale with the serving quantization
(int4 weights, dynamic act quant) and slope-times the prefill forward at
several batch sizes, then per-op-profiles the largest one so the gap has
a name (dots vs quant reduces vs view requant vs attention vs copies).

Run: python benchmarks/prefill_breakdown.py [--batches 4,16]
         [--seq 624] [--profile] [--top 25]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import timed_loop  # noqa: E402
from profile_stage import parse_trace, print_table  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="4,16")
    p.add_argument("--seq", default=624, type=int)
    p.add_argument("--bits", default=4, type=int, choices=[4, 8])
    p.add_argument("--no_act_quant", action="store_true")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--top", default=25, type=int)
    args = p.parse_args()

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.llama import LlamaModel

    cfg = GroveConfig()
    lcfg = dataclasses.replace(
        cfg.llama, weight_quant=True, weight_quant_bits=args.bits,
        act_quant=not args.no_act_quant)
    model = LlamaModel(cfg=lcfg, dtype=jnp.bfloat16)
    d = lcfg.hidden_size
    S = args.seq

    emb1 = jnp.zeros((1, S, d), jnp.bfloat16)
    pos1 = jnp.arange(S, dtype=jnp.int32)[None]
    shapes = jax.eval_shape(
        lambda r: model.init(r, emb1, pos1)["params"],
        jax.random.PRNGKey(0))
    # allocate directly in serving dtypes: zeros for kernels (timing is
    # value-independent on TPU), ones for every scale so dequant math
    # stays finite
    params = jax.jit(lambda: jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype), shapes))()
    params = jax.tree_util.tree_map_with_path(
        lambda kp, x: (jnp.ones_like(x)
                       if "scale" in str(getattr(kp[-1], "key", ""))
                       else x), params)

    # per-token FLOPs: 7 projections + lm-head-free stack (LlamaModel has
    # no lm_head) + attention (2 * S * d per token per layer, causal/2).
    # k/v projections scale with num_kv_heads (GQA-aware).
    nl, inter = lcfg.num_layers, lcfg.intermediate_size
    head_dim = d // lcfg.num_heads
    kv_dim = lcfg.num_kv_heads * head_dim
    proj_flops_tok = 2 * nl * (2 * d * d + 2 * d * kv_dim + 3 * d * inter)
    attn_flops_tok = nl * 2 * 2 * S * d / 2  # QK^T + PV, causal half

    fn = jax.jit(lambda p, e, po: model.apply({"params": p}, e, po)[0])

    results = {}
    for b in [int(x) for x in args.batches.split(",")]:
        emb = jnp.zeros((b, S, d), jnp.bfloat16)
        pos = jnp.broadcast_to(pos1, (b, S))
        secs = timed_loop(fn, params, emb, pos, iters=3, extra=8,
                          repeats=3)
        toks = b * S
        tf = toks * (proj_flops_tok + attn_flops_tok) / secs / 1e12
        results[b] = (secs, tf)
        print(f"batch {b:3d}: {secs*1e3:8.2f} ms  "
              f"{secs*1e6/toks:6.2f} us/token  {tf:6.1f} TF/s eff",
              flush=True)

    if args.profile:
        import tempfile
        b = max(int(x) for x in args.batches.split(","))
        emb = jnp.zeros((b, S, d), jnp.bfloat16)
        pos = jnp.broadcast_to(pos1, (b, S))
        out = fn(params, emb, pos)
        np.asarray(out[(0,) * out.ndim])
        tdir = tempfile.mkdtemp(prefix="prof_prefill_")
        with jax.profiler.trace(tdir):
            for _ in range(2):
                out = fn(params, emb, pos)
            np.asarray(out[(0,) * out.ndim])
        print_table(parse_trace(tdir), args.top, total_scale=0.5)


if __name__ == "__main__":
    main()
