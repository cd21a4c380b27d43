"""Isolated fused-LN-quant kernel vs the XLA LN->quant chain.

Run: python benchmarks/ln_probe.py [--rows 32768] [--cols 1280]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import timed_loop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", default=32768, type=int)
    p.add_argument("--cols", default=1280, type=int)
    p.add_argument("--iters", default=16, type=int)
    args = p.parse_args()

    from grove_tpu.ops.fused_ln import layernorm_quant

    n, c = args.rows, args.cols
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    s = jnp.asarray(0.03, jnp.float32)

    def xla_chain(x, g, b, s):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        d = xf - mu
        var = (d * d).mean(-1, keepdims=True)
        y = d * jax.lax.rsqrt(var + 1e-6) * g + b
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    report = {"rows": n, "cols": c,
              "bytes_moved_mb": round(n * c * 3 / 1e6, 1)}
    for name, fn in [
        ("xla_chain", xla_chain),
        ("pallas_fused", lambda x, g, b, s: layernorm_quant(
            x, g, b, s, eps=1e-6, use_kernel=True, block_rows=256)),
        ("pallas_fused_b512", lambda x, g, b, s: layernorm_quant(
            x, g, b, s, eps=1e-6, use_kernel=True, block_rows=512)),
        ("pallas_fused_b1024", lambda x, g, b, s: layernorm_quant(
            x, g, b, s, eps=1e-6, use_kernel=True, block_rows=1024)),
    ]:
        ms = timed_loop(fn, x, g, b, s, iters=args.iters) * 1e3
        gbs = n * c * 3 / (ms / 1e3) / 1e9
        report[name + "_ms"] = round(ms, 3)
        report[name + "_gbs"] = round(gbs, 1)
        print(f"  {name}: {ms:.3f} ms ({gbs:.0f} GB/s)", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
