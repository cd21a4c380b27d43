"""Pallas flash-attention backward kernels (causal/full, TPU).

Completes the flash-attention story: the forward kernel in
`ops.attention` gains an LSE output here, and two backward kernels compute
dq and (dk, dv) without ever materializing the S x S attention matrix —
replacing the XLA-vjp fallback whose S^2 buffers dominated train-step HBM.

Standard flash backward decomposition (Dao et al.):
    p_ij  = exp(q_i k_j^T * scale - lse_i)
    D_i   = rowsum(dO_i * O_i)
    dv_j  = sum_i p_ij^T dO_i
    ds_ij = p_ij * (dO_i v_j^T - D_i)
    dq_i  = scale * sum_j ds_ij k_j
    dk_j  = scale * sum_i ds_ij^T q_i

Mosaic notes (this environment): dynamic-start slices must be on the
SUBLANE dim and interleaving reshapes are avoided. Row statistics (lse, D)
are carried as (B*H, n_blocks, block) arrays — a (B*H, S, 1) layout tiles
its minor dim to 128 lanes (128x HBM padding, gigabytes at SAM/LLaMA train
shapes). Per-q-block rows live on the LANE dim, are selected by dynamic
SUBLANE index, and are converted to/from per-row columns inside the kernels
with 0/1 iota-eye reductions (transposes are not lowered reliably here).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _col_to_row(col):
    """(n, 1) -> (1, n) via an iota-eye reduction (no transpose)."""
    n = col.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (r == c).astype(col.dtype)
    return jnp.sum(eye * col, axis=0, keepdims=True)


def _row_to_col(row):
    """(1, n) -> (n, 1) via an iota-eye reduction (no transpose)."""
    n = row.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (r == c).astype(row.dtype)
    return jnp.sum(eye * row, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# forward with LSE output
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, causal, scale,
                block_k, kv_len):
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, d = q.shape
    qi = pl.program_id(1)
    q_offset = qi * block_q

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_kv = pl.cdiv(kv_len, block_k)
    if causal:
        num_kv = jnp.minimum(num_kv, pl.cdiv(q_offset + block_q, block_k))

    def body(ki, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if causal:
            qpos = q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            kpos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(kpos <= qpos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.dot(p, v,
                                       preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0, pl.ds(qi, 1), :] = _col_to_row(
        m + jnp.log(jnp.maximum(l, 1e-30))).astype(jnp.float32)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, dq_ref, *,
               causal, scale, block_k, kv_len):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    qi = pl.program_id(1)
    lse = _row_to_col(lse_ref[0, pl.ds(qi, 1), :]
                      .astype(jnp.float32))                # (block_q, 1)
    dcap = _row_to_col(dcap_ref[0, pl.ds(qi, 1), :]
                       .astype(jnp.float32))               # (block_q, 1)
    block_q, d = q.shape
    q_offset = qi * block_q

    num_kv = pl.cdiv(kv_len, block_k)
    if causal:
        num_kv = jnp.minimum(num_kv, pl.cdiv(q_offset + block_q, block_k))

    def body(ki, dq):
        k = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if causal:
            qpos = q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            kpos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(kpos <= qpos, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dcap)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kv,
                           body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, dk_ref,
                dv_ref, *, causal, scale, block_q, q_len):
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    block_k, d = k.shape
    ki = pl.program_id(1)
    k_offset = ki * block_k

    start = (k_offset // block_q) if causal else 0
    num_q = pl.cdiv(q_len, block_q)

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = _row_to_col(lse_ref[0, pl.ds(qi, 1), :].astype(jnp.float32))
        dcap = _row_to_col(dcap_ref[0, pl.ds(qi, 1), :]
                           .astype(jnp.float32))
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if causal:
            qpos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            kpos = k_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(kpos <= qpos, s, NEG_INF)
        p = jnp.exp(s - lse)                                 # (bq, bk)
        dv_new = dv + jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dcap)
        dk_new = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk, dv = jax.lax.fori_loop(
        start, num_q, body,
        (jnp.zeros((block_k, d), jnp.float32),
         jnp.zeros((block_k, d), jnp.float32)))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers (folded (B*H, S, D) layout)
# ---------------------------------------------------------------------------

def _fold(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _unfold(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block"))
def flash_forward_lse(q, k, v, *, causal: bool, scale: float,
                      block: int = 512):
    """(B, S, H, D) -> (out (B, S, H, D), lse (B*H, n_blk, block) fp32).

    Row statistics are laid out per q-block on the lane dim — compact on
    TPU, where a (B*H, S, 1) layout would tile its minor dim to 128 lanes
    (128x HBM padding)."""
    b, s, h, d = q.shape
    block = min(block, s)
    assert s % block == 0
    nblk = s // block
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    kernel = functools.partial(_fwd_kernel, causal=causal, scale=scale,
                               block_k=block, kv_len=s)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, nblk),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, block), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, nblk, block), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    return _unfold(out, b, h), lse


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block"))
def flash_backward(q, k, v, out, lse, g, *, causal: bool, scale: float,
                   block: int = 512):
    """Flash backward. `lse` in the (B*H, n_blk, block) layout of
    `flash_forward_lse`. Returns (dq, dk, dv) in (B, S, H, D)."""
    b, s, h, d = q.shape
    block = min(block, s)
    assert s % block == 0
    nblk = s // block
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    of, gf = _fold(out), _fold(g)
    dcap = jnp.sum(of.astype(jnp.float32) * gf.astype(jnp.float32),
                   axis=-1).reshape(b * h, nblk, block)

    interp = jax.default_backend() != "tpu"
    dq_kernel = functools.partial(_dq_kernel, causal=causal, scale=scale,
                                  block_k=block, kv_len=s)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * h, nblk),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, block), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, block), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        interpret=interp,
    )(qf, kf, vf, gf, lse, dcap)

    dkv_kernel = functools.partial(_dkv_kernel, causal=causal, scale=scale,
                                   block_q=block, q_len=s)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, nblk),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, block), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, block), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        ),
        interpret=interp,
    )(qf, kf, vf, gf, lse, dcap)

    return (_unfold(dq, b, h), _unfold(dk, b, h), _unfold(dv, b, h))


# ---------------------------------------------------------------------------
# full custom-vjp attention (used by multi_head_attention on TPU)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_trainable(q, k, v, causal: bool, scale: float,
                              block: int = 512):
    out, _ = flash_forward_lse(q, k, v, causal=causal, scale=scale,
                               block=block)
    return out


def _fa_fwd(q, k, v, causal, scale, block):
    out, lse = flash_forward_lse(q, k, v, causal=causal, scale=scale,
                                 block=block)
    return out, (q, k, v, out, lse)


def _fa_bwd(causal, scale, block, res, g):
    q, k, v, out, lse = res
    return flash_backward(q, k, v, out, lse, g, causal=causal,
                          scale=scale, block=block)


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)
