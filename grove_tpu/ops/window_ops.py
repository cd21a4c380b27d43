"""Pallas window partition/unpartition for ViTDet windowed attention.

XLA lowers `window_partition` (pad 32->42, reshape, transpose) and its
inverse as pad + generic transpose copies — profiled ~58 ms of copies +
~22 ms of reshapes per 32-frame SAM-H stage (b4), ~120 GB/s effective.
These kernels express each direction as ONE block-copy pass whose
"transpose" lives entirely in the BlockSpec index maps: a grid cell
moves one (win, win, C) tile between the (B, Hp, Wp, C) grid layout and
its contiguous slot in the (B, gh, gw, win, win, C) window layout
(which reshapes for free to (B*nW, win*win, C)). The zero-pad /
pad-drop stays in XLA (cheap elementwise pad/slice); the expensive
strided relayout rides the kernel's aligned DMA.

Both directions are linear maps and each other's adjoint, so the
custom VJPs are each other (pad zeros <-> drop pads) and the kernels
are usable in training.

Semantics match `models/sam_encoder.py:window_partition/unpartition`
(reference `model/SAM/modeling/image_encoder.py` window helpers).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _part_kernel(x_ref, o_ref, *, win: int, gw: int):
    # one row-band (win rows x all window columns) per cell; Mosaic's
    # block-mapping rule (last two block dims %8/%128 or equal to the
    # array dims) forbids win-sized blocks, so the column slicing
    # happens in-VMEM with static sublane slices
    x = x_ref[0]                       # (win, wp, c)
    c = x.shape[-1]
    for j in range(gw):
        tile = x[:, j * win:(j + 1) * win, :]
        o_ref[0, 0, j] = tile.reshape(win * win, c)


def _unpart_kernel(y_ref, o_ref, *, win: int, gw: int):
    y = y_ref[0, 0]                    # (gw, win*win, c)
    c = y.shape[-1]
    o_ref[0] = jnp.concatenate(
        [y[j].reshape(win, win, c) for j in range(gw)], axis=1)


def _partition_fwd(x, win: int):
    b, h, w, c = x.shape
    pad_h = (-h) % win
    pad_w = (-w) % win
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    gh, gw = hp // win, wp // win
    out = pl.pallas_call(
        functools.partial(_part_kernel, win=win, gw=gw),
        grid=(b, gh),
        in_specs=[pl.BlockSpec((1, win, wp, c),
                               lambda bb, i: (bb, i, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, gw, win * win, c),
                               lambda bb, i: (bb, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, gh, gw, win * win, c),
                                       x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x)
    return out.reshape(b * gh * gw, win, win, c)


def _unpartition_fwd(windows, win: int, hw: Tuple[int, int]):
    h, w = hw
    gh, gw = -(-h // win), -(-w // win)
    hp, wp = gh * win, gw * win
    nw = gh * gw
    b = windows.shape[0] // nw
    c = windows.shape[-1]
    y = windows.reshape(b, gh, gw, win * win, c)
    out = pl.pallas_call(
        functools.partial(_unpart_kernel, win=win, gw=gw),
        grid=(b, gh),
        in_specs=[pl.BlockSpec((1, 1, gw, win * win, c),
                               lambda bb, i: (bb, i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, win, wp, c),
                               lambda bb, i: (bb, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), windows.dtype),
        interpret=jax.default_backend() != "tpu",
    )(y)
    if hp != h or wp != w:
        out = out[:, :h, :w]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def window_partition_fused(x, win: int):
    """(B, H, W, C) -> (B*nW, win, win, C), zero-padded, one-pass
    relayout."""
    return _partition_fwd(x, win)


def _wp_fwd(x, win):
    return _partition_fwd(x, win), x.shape[1:3]


def _wp_bwd(win, hw, g):
    return (_unpartition_fwd(g, win, hw),)


window_partition_fused.defvjp(_wp_fwd, _wp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def window_unpartition_fused(windows, win: int, hw: Tuple[int, int]):
    """(B*nW, win, win, C) -> (B, H, W, C), pads dropped, one-pass
    relayout."""
    return _unpartition_fwd(windows, win, hw)


def _wu_fwd(windows, win, hw):
    return _unpartition_fwd(windows, win, hw), None


def _wu_bwd(win, hw, _, g):
    return (_partition_fwd(g, win),)


window_unpartition_fused.defvjp(_wu_fwd, _wu_bwd)
