"""Probe: grid-native windowed SAM attention (no window partition).

Round-3 HLO attribution left ~243 ms of copies + ~120 ms of padded-row
qkv dot time in the b16 SAM stage (VERDICT r3 #1a). Both exist only to
feed the windowed attention kernel in (nW, 196, C) layout:

  current — partition int8 x (pad 32->42 grid + 6D transpose), qkv on
            the PADDED windows (1764 rows/frame, 1.72x flops), rel
            terms on padded windows, v2 kernel, unpartition int8 out
  grid    — qkv + rel terms on the UNPADDED grid (1024 rows/frame);
            the kernel's index maps pull (14, 14) window tiles straight
            from the (B, G, G, C) arrays (grid (B, 3, 3), cdiv blocks),
            masking the 42>32 overhang in-kernel. Reference zero-pad
            window semantics (pad tokens = qkv BIAS vectors, since
            qkv(0) = b) are reproduced by a (s, 1) select against the
            bias row. Output written back as int8 grid tiles — the
            partition/unpartition relayouts never exist.

Run: python benchmarks/sam_grid_probe.py [--frames 32]
"""

import argparse
import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import timed_loop

from grove_tpu.ops.sam_attention import (
    LOG2E, EXP2_SHIFT, relpos_terms_raw,
    grouped_window_attention_relpos_v2_q8)
from grove_tpu.ops.sam_encoder_tables import gather_rel_tables
from grove_tpu.models.sam_encoder import (window_partition,
                                          window_unpartition)


def _grid_kernel(q_ref, k_ref, v_ref, r_ref, bk_ref, bv_ref, inv_ref,
                 o_ref, *, win: int, grid_hw: int, heads: int,
                 head_dim: int):
    """One window per grid cell, tiles pulled straight from grid layout.

    Blocks: q/k/v (1, win, win, H*D); r (1, win, win, H*(2*win));
    bk/bv (1, C) the qkv bias rows for k and v; inv (SMEM) 1/act_scale.
    """
    wy = pl.program_id(1)
    wx = pl.program_id(2)
    s = win * win
    c = heads * head_dim
    dt = q_ref.dtype
    gs = 2 * win

    q = q_ref[0].reshape(s, c)
    k = k_ref[0].reshape(s, c)
    v = v_ref[0].reshape(s, c)
    r = r_ref[0].reshape(s, heads * gs)

    # kv tokens that fall outside the real grid: the reference attends
    # over zero-PADDED window rows, whose qkv output is exactly the bias
    idx = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    rr = idx // win
    cc = idx % win
    valid = ((wy * win + rr) < grid_hw) & ((wx * win + cc) < grid_hw)
    k = jnp.where(valid, k, bk_ref[0][None, :].astype(dt))
    v = jnp.where(valid, v, bv_ref[0][None, :].astype(dt))

    col = jax.lax.broadcasted_iota(jnp.int32, (win, s), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (win, s), 0)
    expand_rows = (col // win == row).astype(dt)
    colw = jax.lax.broadcasted_iota(jnp.int32, (win, s), 1)
    xw = jax.lax.broadcasted_iota(jnp.int32, (win, s), 0)
    expand_cols = (colw % win == xw).astype(dt)
    expand = jnp.concatenate([expand_rows, expand_cols], axis=0)
    ones8 = jnp.ones((s, 8), dt)

    out = jnp.zeros((s, c), jnp.int8)
    for h in range(heads):
        qh = q[:, h * head_dim:(h + 1) * head_dim]
        kh = k[:, h * head_dim:(h + 1) * head_dim]
        vh = v[:, h * head_dim:(h + 1) * head_dim]
        rhw = r[:, h * gs:(h + 1) * gs]
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        bias = jnp.dot(rhw, expand, preferred_element_type=jnp.float32)
        p = jnp.exp2(logits + bias - EXP2_SHIFT).astype(dt)
        denom = jax.lax.dot_general(
            p, ones8, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0:1]
        oh = (jnp.dot(p, vh, preferred_element_type=jnp.float32)
              / jnp.maximum(denom, 1e-30))
        oh = jnp.clip(jnp.round(oh * inv_ref[0]), -127.0, 127.0)
        o_ref[0, :, :, h * head_dim:(h + 1) * head_dim] = \
            oh.astype(jnp.int8).reshape(win, win, head_dim)


@functools.partial(jax.jit,
                   static_argnames=("win", "num_heads"))
def grid_window_attention_q8(q, k, v, rel_packed, bias_k, bias_v,
                             inv_scale, win: int, num_heads: int):
    """q/k/v: (B, G, G, C) bf16 straight from qkv on the unpadded grid.
    rel_packed: (B, G, G, H*2win). Returns int8 (B, G, G, C)."""
    b, g, _, c = q.shape
    hd = c // num_heads
    scale = 1.0 / math.sqrt(hd)
    nw = -(-g // win)

    q = (q * jnp.asarray(scale * LOG2E, q.dtype)).astype(q.dtype)
    rel_packed = (rel_packed * jnp.asarray(LOG2E, rel_packed.dtype)
                  ).astype(rel_packed.dtype)

    kernel = functools.partial(_grid_kernel, win=win, grid_hw=g,
                               heads=num_heads, head_dim=hd)
    return pl.pallas_call(
        kernel,
        grid=(b, nw, nw),
        in_specs=[
            pl.BlockSpec((1, win, win, c), lambda i, y, x: (i, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, win, c), lambda i, y, x: (i, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, win, c), lambda i, y, x: (i, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, win, num_heads * 2 * win),
                         lambda i, y, x: (i, y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, y, x: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, y, x: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, win, win, c),
                               lambda i, y, x: (i, y, x, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g, g, c), jnp.int8),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, rel_packed, bias_k, bias_v,
      inv_scale.astype(jnp.float32).reshape(1))


def relpos_terms_grid(q, rel_pos_h, rel_pos_w, win: int, num_heads: int):
    """Rel terms computed in GRID layout: (B, G, G, C) -> packed
    (B, G, G, H*2win). Window-local coords via `global % win` (windows
    tile consecutively), so the einsums never see padded rows."""
    b, g, _, c = q.shape
    hd = c // num_heads
    Rh, Rw = gather_rel_tables(rel_pos_h, rel_pos_w, win, win)
    ih = np.arange(g) % win
    Rh_e = jnp.asarray(Rh)[ih].astype(q.dtype)   # (g, win, hd)
    Rw_e = jnp.asarray(Rw)[ih].astype(q.dtype)
    r_q = q.reshape(b, g, g, num_heads, hd)
    rel_h = jnp.einsum("bxwnc,xkc->bxwnk", r_q, Rh_e)
    rel_w = jnp.einsum("bxwnc,wkc->bxwnk", r_q, Rw_e)
    packed = jnp.concatenate([rel_h, rel_w], axis=-1)
    return packed.reshape(b, g, g, num_heads * 2 * win)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", default=32, type=int)
    p.add_argument("--grid", default=32, type=int)
    p.add_argument("--dim", default=1280, type=int)
    p.add_argument("--heads", default=16, type=int)
    p.add_argument("--win", default=14, type=int)
    p.add_argument("--iters", default=5, type=int)
    args = p.parse_args()

    bt, g, c, nh, win = (args.frames, args.grid, args.dim, args.heads,
                         args.win)
    hd = c // nh
    rng = np.random.default_rng(0)

    # synthetic static-W8A8 block state
    xq = jnp.asarray(rng.integers(-127, 128, (bt, g, g, c)), jnp.int8)
    sx = jnp.float32(0.01)                      # LN act scale
    wq = jnp.asarray(rng.integers(-127, 128, (c, 3 * c)), jnp.int8)
    wscale = jnp.asarray(rng.normal(0, 1e-4, (3 * c,)) ** 2 + 1e-5,
                         jnp.float32)
    wbias = jnp.asarray(rng.normal(0, 0.02, (3 * c,)), jnp.float32)
    rel_h = jnp.asarray(rng.normal(0, 0.02, (2 * win - 1, hd)),
                        jnp.float32)
    rel_w = jnp.asarray(rng.normal(0, 0.02, (2 * win - 1, hd)),
                        jnp.float32)
    pscale = jnp.float32(0.02)                  # proj act scale
    inv = 1.0 / pscale

    def qkv_dense(x2d):                          # int8 x int8 + bias
        y = jax.lax.dot_general(x2d, wq, (((x2d.ndim - 1,), (0,)),
                                          ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * sx * wscale + wbias).astype(jnp.bfloat16)

    @jax.jit
    def path_current(xq):
        xw, pad_hw = window_partition(xq, win)   # int8 partition
        nb, s = xw.shape[0], win * win
        qkv = qkv_dense(xw.reshape(nb, s, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = grouped_window_attention_relpos_v2_q8(
            q, k, v, relpos_terms_raw(q, rel_h, rel_w, (win, win), nh),
            inv, (win, win), nh, group=2)
        out = window_unpartition(out.reshape(nb, win, win, c), win,
                                 pad_hw, (g, g))
        return out

    @jax.jit
    def path_grid(xq):
        qkv = qkv_dense(xq.reshape(bt, g * g, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bt, g, g, c)
        k = k.reshape(bt, g, g, c)
        v = v.reshape(bt, g, g, c)
        rel = relpos_terms_grid(q, rel_h, rel_w, win, nh)
        bias_k = wbias[None, c:2 * c]
        bias_v = wbias[None, 2 * c:]
        return grid_window_attention_q8(q, k, v, rel, bias_k, bias_v,
                                        inv, win, nh)

    a = np.asarray(path_current(xq))
    b_ = np.asarray(path_grid(xq))
    diff = np.abs(a.astype(np.int32) - b_.astype(np.int32))
    frac = float((diff > 1).mean())
    print(f"parity: max int8 diff {diff.max()}, frac>1 {frac:.2e}",
          flush=True)
    assert diff.max() <= 1 and frac == 0.0, "grid kernel mismatch"

    for name, fn in [("current", path_current), ("grid", path_grid)]:
        secs = timed_loop(fn, xq, iters=args.iters)
        print(f"  {name}: {secs * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
