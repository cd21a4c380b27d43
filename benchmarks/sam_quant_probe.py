"""Probe: W8A8 int8 SAM blocks vs bf16 at full SAM-H/512 scale.

The SAM stage is compute-bound (~46% MFU, 36% of e2e). int8 x int8 MXU
dots with f32 accumulation measure 345 TOP/s vs 173 TF/s bf16 on this
chip (2.0x) — this probe times one windowed and one global SamBlock in
both precisions to size the stage-level win.

Run: python benchmarks/sam_quant_probe.py [--frames 32]
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

# standalone SamBlock param paths have no blocks_N prefix
_BLOCK_PATTERNS = (r"attn/(qkv|proj)$", r"mlp/lin[12]$")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", default=32, type=int)
    p.add_argument("--iters", default=8, type=int)
    args = p.parse_args()

    from grove_tpu.config import SamEncoderConfig
    from grove_tpu.models.sam_encoder import SamBlock
    from grove_tpu.ops.quant import quantize_tree

    cfg = SamEncoderConfig()
    qcfg = SamEncoderConfig(quant_w8a8=True)
    bt, g, c = args.frames, cfg.grid, cfg.embed_dim
    rng = jax.random.PRNGKey(0)
    report = {"frames": bt}

    x = jax.jit(lambda: 0.02 * jnp.ones((bt, g, g, c), jnp.bfloat16))()

    def timeit(name, fn, *fargs):
        secs = timed_loop(fn, *fargs, iters=args.iters)
        report[name] = round(secs * 1e3, 2)
        print(f"  {name}: {secs*1e3:.2f} ms", flush=True)
        return secs

    for wname, win in (("windowed", cfg.window_size), ("global", 0)):
        block = SamBlock(cfg, window_size=win, dtype=jnp.bfloat16)
        bvars = jax.jit(block.init)(rng, x)
        timeit(f"{wname}_bf16_ms", lambda v, a: block.apply(v, a),
               bvars, x)

        qparams = quantize_tree(bvars["params"], _BLOCK_PATTERNS)
        qblock = SamBlock(qcfg, window_size=win, dtype=jnp.bfloat16)
        qvars = {"params": qparams}
        timeit(f"{wname}_w8a8_ms", lambda v, a: qblock.apply(v, a),
               qvars, x)

        got = qblock.apply(qvars, x)
        want = block.apply(bvars, x)
        diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                     - want.astype(jnp.float32))))
        report[f"{wname}_maxdiff"] = diff
        print(f"  {wname} w8a8 vs bf16 maxdiff: {diff:.3e}", flush=True)
        del bvars, qvars, qparams

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
