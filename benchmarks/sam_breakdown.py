"""SAM-H encoder stage breakdown on the real chip.

`full_scale.py` shows sam_encode as the largest e2e stage (~872 ms for
32 frames, ~25% true MFU). This times its pieces in isolation — patchify,
one windowed block, one global block, adapter, neck, window round-trip,
fused rel-pos attention vs plain attention — to locate the waste before
optimizing.

Run: python benchmarks/sam_breakdown.py [--frames 32]
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

from _timing import timed_loop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", default=32, type=int,
                   help="B*T fold (full bench uses batch 4 x 8 frames)")
    p.add_argument("--iters", default=5, type=int)
    args = p.parse_args()

    from grove_tpu.config import SamEncoderConfig
    from grove_tpu.models.sam_encoder import (SamBlock, SamImageEncoder,
                                              window_partition,
                                              window_unpartition)

    cfg = SamEncoderConfig()           # full SAM-H/512
    bt = args.frames
    g = cfg.grid
    c = cfg.embed_dim
    rng = jax.random.PRNGKey(0)

    report = {"frames": bt, "grid": g, "embed_dim": c}

    x = jax.jit(lambda: jnp.zeros((bt, g, g, c), jnp.bfloat16))()

    def timeit(name, fn, *fargs):
        secs = timed_loop(fn, *fargs, iters=args.iters)
        report[name] = round(secs * 1e3, 2)
        print(f"  {name}: {secs*1e3:.2f} ms", flush=True)
        return secs

    # one windowed block + one global block (the encoder is 28 windowed +
    # 4 global+adapter)
    wblock = SamBlock(cfg, window_size=cfg.window_size, dtype=jnp.bfloat16)
    wvars = jax.jit(wblock.init)(rng, x)
    timeit("windowed_block_ms", lambda v, a: wblock.apply(v, a), wvars, x)

    gblock = SamBlock(cfg, window_size=0, dtype=jnp.bfloat16)
    gvars = jax.jit(gblock.init)(rng, x)
    timeit("global_block_ms", lambda v, a: gblock.apply(v, a), gvars, x)

    # window partition round trip alone (pad 32->42: 72% padded tokens)
    def round_trip(a):
        w, pad_hw = window_partition(a, cfg.window_size)
        return window_unpartition(w, cfg.window_size, pad_hw, (g, g))
    timeit("window_round_trip_ms", round_trip, x)

    # fused rel-pos attention vs plain attention on the windowed shape
    win = cfg.window_size
    nwin = ((g + win - 1) // win) ** 2 * bt
    nh, hd = cfg.num_heads, c // cfg.num_heads
    q = jax.jit(lambda: jnp.zeros((nwin, win * win, nh, hd),
                                  jnp.bfloat16))()
    rel = jax.jit(lambda: jnp.zeros((2 * win - 1, hd), jnp.float32))()
    from grove_tpu.ops.attention import multi_head_attention
    from grove_tpu.ops.sam_attention import sam_attention_with_relpos
    timeit("win_attn_relpos_ms",
           lambda a, r: sam_attention_with_relpos(a, a, a, r, r,
                                                  (win, win)), q, rel)
    timeit("win_attn_plain_ms",
           lambda a: multi_head_attention(a, a, a, impl="xla"), q)

    # patchify + neck + adapter
    frames = jax.jit(lambda: jnp.zeros(
        (bt, cfg.img_size, cfg.img_size, 3), jnp.bfloat16))()
    import flax.linen as nn
    from grove_tpu.models.sam_encoder import _PatchEmbed
    patch = _PatchEmbed(c, cfg.patch_size, dtype=jnp.bfloat16)
    pvars = jax.jit(patch.init)(rng, frames)
    timeit("patchify_ms", lambda v, f: patch.apply(v, f), pvars, frames)

    from grove_tpu.models.layers import LayerNorm2d
    class Neck(nn.Module):
        @nn.compact
        def __call__(self, a):
            xf = a.astype(jnp.float32)
            xf = nn.Conv(cfg.out_chans, (1, 1), use_bias=False,
                         dtype=jnp.float32, name="c1")(xf)
            xf = LayerNorm2d(name="l1")(xf)
            xf = nn.Conv(cfg.out_chans, (3, 3), padding="SAME",
                         use_bias=False, dtype=jnp.float32, name="c2")(xf)
            xf = LayerNorm2d(name="l2")(xf)
            return xf.astype(jnp.bfloat16)
    neck = Neck()
    nvars = jax.jit(neck.init)(rng, x)
    timeit("neck_fp32_ms", lambda v, a: neck.apply(v, a), nvars, x)

    from grove_tpu.models.layers import SpatioTemporalConvAdapter
    grid5 = jax.jit(lambda: jnp.zeros((bt // 8, 8, g, g, c),
                                      jnp.bfloat16))()
    ad = SpatioTemporalConvAdapter(dtype=jnp.bfloat16)
    avars = jax.jit(ad.init)(rng, grid5)
    timeit("adapter_ms", lambda v, a: ad.apply(v, a), avars, grid5)

    est = (report["windowed_block_ms"] * 28 + report["global_block_ms"] * 4
           + report["adapter_ms"] * 4 + report["patchify_ms"]
           + report["neck_fp32_ms"])
    report["estimated_total_ms"] = round(est, 1)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
