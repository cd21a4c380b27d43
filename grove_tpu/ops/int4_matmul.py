"""Fused int4-weight matmul: dequantize in VMEM, dot on the MXU.

Why a kernel: XLA materializes dot operands, so an int4 weight matrix
consumed as `wq.astype(bf16) * scale` would write the full bf16 kernel
back to HBM every call — erasing the 4x byte win that motivates int4 in
the first place. This kernel streams the PACKED int4 blocks into VMEM,
dequantizes on the VPU, and feeds the MXU directly; the bf16 weights
never exist in HBM.

Scale handling exploits group == k-block: with GPTQ-convention group-wise
scales s(K/G, N) and the k-grid stepping one group per iteration, every
weight element in a k-block shares its scale row, so

    sum_k x[m,k] * (q4[k,n] * s[g,n])  ==  s[g,n] * sum_k x[m,k] * q4[k,n]

and the scale applies to the (bm, bn) dot OUTPUT tile — one VPU multiply
per k-step instead of scaling the weights element-wise.

Used by `models.layers.Int4Dense` for multi-token (prefill) shapes; the
single-token decode row uses a grouped-einsum XLA form instead (tiny
intermediate, no kernel needed). Reference analogue: the serving-side
W4 weight-only path of `model/language_model/...` has no counterpart —
the reference serves bf16 only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, k_steps: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                   # (bm, bk) compute dtype
    w = w_ref[...].astype(x.dtype)                   # (bk, bn) int4 -> bf16
    p = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (bm, bn)
    acc_ref[...] += p * s_ref[...]                   # s: (1, bn) group row

    @pl.when(kk == k_steps - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_a8(x_ref, sx_ref, w_ref, s_ref, o_ref, acc_ref, *,
               k_steps: int):
    """W4A8 variant: int8 activations x (int4 -> int8) weights ride the
    MXU's int8 path (measured 2.0x the bf16 rate on v5e), f32
    accumulation (exact: |acc per group| <= 128*127*7 ~ 1.1e5 << 2^24).
    Per-token activation scales apply once at the final store."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                   # (bm, bk) int8
    w = w_ref[...].astype(jnp.int8)                  # (bk, bn) int4 -> int8
    p = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (bm, bn)
    acc_ref[...] += p * s_ref[...]                   # s: (1, bn) group row

    @pl.when(kk == k_steps - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * sx_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def int4_matmul(x, wq, scale, block_m: int = 256, block_n: int = 512):
    """x (M, K) bf16/f32 @ wq (K, N) int4 with scale (K/G, N) f32 -> (M, N).

    Requires K % G == 0 with G = K // scale.shape[0] a multiple of 128
    (the k-block IS the quantization group). M is padded to block_m
    internally; N must divide by block_n or be <= block_n.
    """
    m, k = x.shape
    kw, n = wq.shape
    assert k == kw, (x.shape, wq.shape)
    groups = scale.shape[0]
    assert k % groups == 0
    block_k = k // groups
    assert block_k % 128 == 0, ("int4 k-block must be lane-aligned",
                                block_k)

    block_n = min(block_n, n)
    assert n % block_n == 0, (n, block_n)
    block_m = min(block_m, max(8, m))
    pad_m = (-m) % block_m
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    kernel = functools.partial(_kernel, k_steps=groups)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m, n // block_n, groups),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(x, wq, scale.astype(jnp.float32))
    return out[:m] if pad_m else out


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "out_dtype"))
def int4_matmul_a8(xq, sx, wq, scale, block_m: int = 256,
                   block_n: int = 512, out_dtype=jnp.bfloat16):
    """W4A8: xq (M, K) int8 with per-token scales sx (M, 1) f32 @
    wq (K, N) int4 with group scales scale (K/G, N) f32 -> (M, N).

    y ~= (sx * xq) @ dequant(wq): both matmul operands are integer, so
    the dot runs at the MXU's int8 rate; scales apply to the f32
    accumulator (group scale per k-step, token scale at the store).
    Same blocking contract as `int4_matmul`."""
    m, k = xq.shape
    kw, n = wq.shape
    assert k == kw and sx.shape == (m, 1), (xq.shape, wq.shape, sx.shape)
    groups = scale.shape[0]
    assert k % groups == 0
    block_k = k // groups
    assert block_k % 128 == 0, block_k

    block_n = min(block_n, n)
    assert n % block_n == 0, (n, block_n)
    block_m = min(block_m, max(8, m))
    pad_m = (-m) % block_m
    if pad_m:
        xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        sx = jnp.pad(sx, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    kernel = functools.partial(_kernel_a8, k_steps=groups)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m, n // block_n, groups),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xq, sx.astype(jnp.float32), wq, scale.astype(jnp.float32))
    return out[:m] if pad_m else out
