"""Probe: windowed-block layout variants + patchify conv-vs-matmul.

Decides how SamAttention should arrange the window partition around the
qkv/proj matmuls at SAM-H shapes (32 frames, 32x32 grid, C=1280, win 14):

  old    — partition x once, qkv/proj on the PADDED windows (1.72x flops)
  hoist3 — qkv on the unpadded grid, partition q/k/v separately
  hoist1 — qkv on the unpadded grid, partition the fused (.., 3C) once

Run: python benchmarks/sam_layout_probe.py [--frames 32]
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
    p.add_argument("--frames", default=32, type=int)
    p.add_argument("--grid", default=32, type=int)
    p.add_argument("--dim", default=1280, type=int)
    p.add_argument("--heads", default=16, type=int)
    p.add_argument("--win", default=14, type=int)
    p.add_argument("--iters", default=5, type=int)
    args = p.parse_args()

    from grove_tpu.models.sam_encoder import (_window_pad_mask,
                                              window_partition,
                                              window_unpartition)
    from grove_tpu.ops.sam_attention import sam_attention_with_relpos

    bt, g, c, nh, win = args.frames, args.grid, args.dim, args.heads, args.win
    hd = c // nh
    rng = jax.random.PRNGKey(0)
    x = jax.jit(lambda: jnp.zeros((bt, g, g, c), jnp.bfloat16))()
    wqkv = jax.jit(lambda: jnp.zeros((c, 3 * c), jnp.bfloat16))()
    bqkv = jax.jit(lambda: jnp.zeros((3 * c,), jnp.bfloat16))()
    wproj = jax.jit(lambda: jnp.zeros((c, c), jnp.bfloat16))()
    rel = jax.jit(lambda: jnp.zeros((2 * win - 1, hd), jnp.float32))()

    report = {"frames": bt, "grid": g, "win": win}

    def timeit(name, fn, *fargs):
        secs = timed_loop(fn, *fargs, iters=args.iters)
        report[name] = round(secs * 1e3, 2)
        print(f"  {name}: {secs*1e3:.2f} ms", flush=True)
        return secs

    def attn(q, k, v):
        return sam_attention_with_relpos(q, k, v, rel, rel, (win, win))

    def old(x, wq, bq, wp):
        xp, pad_hw = window_partition(x, win)          # (nw, win, win, c)
        nw = xp.shape[0]
        qkv = xp.reshape(nw, win * win, c) @ wq + bq
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(nw, win * win, nh, hd)
        k = k.reshape(nw, win * win, nh, hd)
        v = v.reshape(nw, win * win, nh, hd)
        out = attn(q, k, v).reshape(nw, win, win, c)
        out = window_unpartition(out, win, pad_hw, (g, g))
        return (out.reshape(bt, g * g, c) @ wp).reshape(bt, g, g, c)

    def hoist3(x, wq, bq, wp):
        qkv = x.reshape(bt, g * g, c) @ wq + bq
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_win(t):
            t, pad_hw = window_partition(t.reshape(bt, g, g, c), win)
            return t.reshape(-1, win * win, nh, hd), pad_hw

        q, pad_hw = to_win(q)
        k, _ = to_win(k)
        v, _ = to_win(v)
        mask = _window_pad_mask(g, g, win)
        m = jnp.asarray(np.tile(mask, (bt, 1)))[:, :, None, None]
        b3 = bq.reshape(3, nh, hd)
        k = jnp.where(m, b3[1], k)
        v = jnp.where(m, b3[2], v)
        out = attn(q, k, v).reshape(-1, win, win, c)
        out = window_unpartition(out, win, pad_hw, (g, g))
        return (out.reshape(bt, g * g, c) @ wp).reshape(bt, g, g, c)

    def hoist1(x, wq, bq, wp):
        qkv = (x.reshape(bt, g * g, c) @ wq + bq).reshape(bt, g, g, 3 * c)
        qkvw, pad_hw = window_partition(qkv, win)      # (nw, win, win, 3c)
        nw = qkvw.shape[0]
        q, k, v = jnp.split(qkvw.reshape(nw, win * win, 3 * c), 3, axis=-1)
        mask = _window_pad_mask(g, g, win)
        m = jnp.asarray(np.tile(mask, (bt, 1)))[:, :, None]
        b3 = bq.reshape(3, c)
        k = jnp.where(m, b3[1], k)
        v = jnp.where(m, b3[2], v)
        q = q.reshape(nw, win * win, nh, hd)
        k = k.reshape(nw, win * win, nh, hd)
        v = v.reshape(nw, win * win, nh, hd)
        out = attn(q, k, v).reshape(nw, win, win, c)
        out = window_unpartition(out, win, pad_hw, (g, g))
        return (out.reshape(bt, g * g, c) @ wp).reshape(bt, g, g, c)

    # v2-kernel variants: q/k/v stay (nW, S, C) raw — no (B*H, S, D) fold
    from grove_tpu.ops.sam_attention import (
        grouped_window_attention_relpos_v2, relpos_terms_raw)

    def attn_v2(q, k, v):
        # rel terms straight in the kernel's packed lane layout (free
        # views on q; no transposes)
        r = relpos_terms_raw(q, rel, rel, (win, win), nh)
        return grouped_window_attention_relpos_v2(q, k, v, r,
                                                  (win, win), nh, group=2)

    def old_v2(x, wq, bq, wp):
        xp, pad_hw = window_partition(x, win)
        nw = xp.shape[0]
        qkv = xp.reshape(nw, win * win, c) @ wq + bq
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = attn_v2(q, k, v).reshape(nw, win, win, c)
        out = window_unpartition(out, win, pad_hw, (g, g))
        return (out.reshape(bt, g * g, c) @ wp).reshape(bt, g, g, c)

    def hoist1_v2(x, wq, bq, wp):
        qkv = (x.reshape(bt, g * g, c) @ wq + bq).reshape(bt, g, g, 3 * c)
        qkvw, pad_hw = window_partition(qkv, win)
        nw = qkvw.shape[0]
        q, k, v = jnp.split(qkvw.reshape(nw, win * win, 3 * c), 3, axis=-1)
        mask = _window_pad_mask(g, g, win)
        m = jnp.asarray(np.tile(mask, (bt, 1)))[:, :, None]
        b3 = bq.reshape(3, c)
        k = jnp.where(m, b3[1], k)
        v = jnp.where(m, b3[2], v)
        out = attn_v2(q, k, v).reshape(nw, win, win, c)
        out = window_unpartition(out, win, pad_hw, (g, g))
        return (out.reshape(bt, g * g, c) @ wp).reshape(bt, g, g, c)

    timeit("old_ms", old, x, wqkv, bqkv, wproj)
    timeit("hoist3_ms", hoist3, x, wqkv, bqkv, wproj)
    timeit("hoist1_ms", hoist1, x, wqkv, bqkv, wproj)
    timeit("old_v2_ms", old_v2, x, wqkv, bqkv, wproj)
    timeit("hoist1_v2_ms", hoist1_v2, x, wqkv, bqkv, wproj)

    # patchify: stride-16 conv vs reshape+matmul
    import flax.linen as nn
    frames = jax.jit(lambda: jnp.zeros((bt, g * 16, g * 16, 3),
                                       jnp.bfloat16))()
    conv = nn.Conv(c, (16, 16), strides=(16, 16), dtype=jnp.bfloat16)
    cvars = jax.jit(conv.init)(rng, frames)
    timeit("patch_conv_ms", lambda v, f: conv.apply(v, f), cvars, frames)

    from grove_tpu.models.sam_encoder import _PatchEmbed
    pe = _PatchEmbed(c, 16, dtype=jnp.bfloat16)
    pvars = jax.jit(pe.init)(rng, frames)
    timeit("patch_matmul_ms", lambda v, f: pe.apply(v, f), pvars, frames)

    # transpose-free patchify: only contiguous reshapes + an einsum whose
    # contracted dh axis XLA handles as 16 accumulated (M,48)x(48,C) dots —
    # the (..., 16, 32, 16, 3) transpose with a 3-wide lane dim never happens
    wk = jax.jit(lambda: jnp.zeros((16, 48, c), jnp.bfloat16))()

    def patch_einsum(f, wk):
        b = f.shape[0]
        xr = f.reshape(b, g, 16, g, 48)      # (b, gh, dh, gw, dw*3)
        return jnp.einsum("bgdwk,dkc->bgwc", xr, wk)

    timeit("patch_einsum_ms", patch_einsum, frames, wk)

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
