"""Pallas backward for SAM decomposed-rel-pos flash attention.

Completes the fused SAM attention: forward gains an LSE output, and the
backward computes dq, dk, dv plus the decomposed-bias term gradients without
materializing S x S.

Math. Forward logits: s_ij = scale * (q_i . k_j) + rh[i, kh(j)] + rw[i, kw(j)]
with rh = einsum(q, Rh), rw = einsum(q, Rw). With ds = p * (dO v^T - D):
    dv_j      = sum_i p_ij^T dO_i
    dk_j      = scale * sum_i ds_ij^T q_i
    d_rh[i,a] = sum_{j: kh(j)=a} ds_ij          (= ds @ E^T per kv block)
    d_rw[i,b] = sum_{j: kw(j)=b} ds_ij          (= ds @ T^T accumulated)
    dq_i      = scale * sum_j ds_ij k_j
                + einsum(d_rh, Rh) + einsum(d_rw, Rw)   [q feeds the bias]
    dRh, dRw  = einsum(d_rh, q), einsum(d_rw, q) scattered into the tables.

The per-row bias-term gradients (d_rh, d_rw) are tiny (S x grid) and are
produced by the dq kernel; the q-side and table-side contractions happen in
XLA outside the kernels.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_backward import _col_to_row, _row_to_col
from .sam_attention import relpos_terms
from .sam_encoder_tables import gather_rel_tables, rel_pos_index

NEG_INF = -1e30


def _selectors_full(k_offset, block_k, grid_h, grid_w):
    """0/1 expansion matrices for a kv block starting at `k_offset`:
    Eh[a, c] = [a == kh(k_offset+c)],  Ew[b, c] = [b == kw(k_offset+c)].
    Built from iota comparisons (lane-dim slicing is unsupported)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (grid_h, block_k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (grid_h, block_k), 0)
    eh = ((k_offset + col) // grid_w == row).astype(jnp.float32)
    colw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, block_k), 1)
    xw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, block_k), 0)
    ew = ((k_offset + colw) % grid_w == xw).astype(jnp.float32)
    return eh, ew


def _fwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, lse_ref, *,
                scale, block_k, grid_h, grid_w, kv_len):
    dt = q_ref.dtype       # dots in input dtype (bf16 MXU fast path in
    q = q_ref[0]           # production; f32 accumulation either way)
    block_q, d = q.shape
    # rh/rw arrive grid-major (gh|gw on the SUBLANE dim): a (bq, gh) lane
    # layout pads gh=14 -> 128 lanes (9x HBM); contractions below use
    # dot_general on dim 0 so no transpose is needed
    rh = rh_ref[0, 0]                           # (gh, bq)
    rw = rw_ref[0, 0]                           # (gw, bq)

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    def body(ki, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        eh, ew = _selectors_full(ki * block_k, block_k, grid_h, grid_w)
        s = s + jax.lax.dot_general(
            rh, eh.astype(dt), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(
            rw, ew.astype(dt), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.dot(p.astype(dt), v,
                                       preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, kv_len // block_k, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0, pl.ds(pl.program_id(1), 1), :] = _col_to_row(
        m + jnp.log(jnp.maximum(l, 1e-30))).astype(jnp.float32)


def _dq_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, do_ref, lse_ref,
               dcap_ref, dq_ref, drh_ref, drw_ref, *, scale, block_k,
               grid_h, grid_w, kv_len):
    dt = q_ref.dtype
    q = q_ref[0]
    do = do_ref[0]
    qi = pl.program_id(1)
    lse = _row_to_col(lse_ref[0, pl.ds(qi, 1), :]
                      .astype(jnp.float32))                # (block_q, 1)
    dcap = _row_to_col(dcap_ref[0, pl.ds(qi, 1), :]
                       .astype(jnp.float32))               # (block_q, 1)
    rh = rh_ref[0, 0]                           # (gh, bq)
    rw = rw_ref[0, 0]                           # (gw, bq)
    block_q, d = q.shape
    num_kv = kv_len // block_k

    def body(ki, carry):
        dq, drh_acc, drw_acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        eh, ew = _selectors_full(ki * block_k, block_k, grid_h, grid_w)
        s = s + jax.lax.dot_general(
            rh, eh.astype(dt), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(
            rw, ew.astype(dt), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - dcap)).astype(dt)                    # (bq, bk)
        dq_new = dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)
        drh_new = drh_acc + jax.lax.dot_general(
            eh.astype(dt), ds, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (gh, bq)
        drw_new = drw_acc + jax.lax.dot_general(
            ew.astype(dt), ds, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (gw, bq)
        return dq_new, drh_new, drw_new

    dq, drh_acc, drw_acc = jax.lax.fori_loop(
        0, num_kv, body,
        (jnp.zeros((block_q, d), jnp.float32),
         jnp.zeros((grid_h, block_q), jnp.float32),
         jnp.zeros((grid_w, block_q), jnp.float32)))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)
    drh_ref[0, 0] = drh_acc.astype(jnp.float32)
    drw_ref[0, 0] = drw_acc.astype(jnp.float32)


def _dkv_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, do_ref, lse_ref,
                dcap_ref, dk_ref, dv_ref, *, scale, block_q, grid_h,
                grid_w, q_len):
    dt = q_ref.dtype
    k = k_ref[0]
    v = v_ref[0]
    block_k, d = k.shape
    ki = pl.program_id(1)
    k_offset = ki * block_k
    eh, ew = _selectors_full(k_offset, block_k, grid_h, grid_w)
    eh = eh.astype(dt)
    ew = ew.astype(dt)
    num_q = q_len // block_q

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, pl.ds(qi * block_q, block_q), :]
        lse = _row_to_col(lse_ref[0, pl.ds(qi, 1), :].astype(jnp.float32))
        dcap = _row_to_col(dcap_ref[0, pl.ds(qi, 1), :]
                           .astype(jnp.float32))
        rh = rh_ref[0, pl.ds(qi, 1), :, :][0]                      # (gh,bq)
        rw = rw_ref[0, pl.ds(qi, 1), :, :][0]                      # (gw,bq)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + jax.lax.dot_general(
            rh, eh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(
            rw, ew, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)
        dv_new = dv + jax.lax.dot_general(
            p.astype(dt), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - dcap)).astype(dt)
        dk_new = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk, dv = jax.lax.fori_loop(
        0, num_q, body,
        (jnp.zeros((block_k, d), jnp.float32),
         jnp.zeros((block_k, d), jnp.float32)))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _fold(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _unfold(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _pick_block(s, w):
    """Largest kv block that is a multiple of the grid width, divides S and
    satisfies the Mosaic sublane rule (8-divisible, or the full S)."""
    best = None
    for cand in range(w, min(s, 512) + 1, w):
        if s % cand == 0 and cand % 8 == 0:
            best = cand
    return best or s


@functools.partial(jax.jit, static_argnames=("hw", "scale"))
def relpos_flash_fwd_lse(q, k, v, rel_h_term, rel_w_term,
                         hw: Tuple[int, int], scale: float):
    b, s, h, d = q.shape
    gh, gw = hw
    block = _pick_block(s, gw)
    nblk = s // block
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    # grid-major (BH, nblk, gh|gw, block): gh/gw on the sublane dim — a
    # lane layout pads 14 -> 128 (9x HBM) at windowed-block shapes
    rhf = rel_h_term.reshape(b * h, nblk, block, gh).transpose(0, 1, 3, 2)
    rwf = rel_w_term.reshape(b * h, nblk, block, gw).transpose(0, 1, 3, 2)
    kernel = functools.partial(_fwd_kernel, scale=scale, block_k=block,
                               grid_h=gh, grid_w=gw, kv_len=s)
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
            pl.BlockSpec((1, 1, gh, block), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gw, block), lambda i, j: (i, j, 0, 0),
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
            # per-q-block rows on the lane dim: a (B*H, S, 1) layout would
            # tile its minor dim to 128 lanes (130x padding at SAM shapes)
            jax.ShapeDtypeStruct((b * h, nblk, block), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf, rhf, rwf)
    return _unfold(out, b, h), lse


@functools.partial(jax.jit, static_argnames=("hw", "scale"))
def relpos_flash_bwd(q, k, v, rel_pos_h, rel_pos_w, out, lse, g,
                     hw: Tuple[int, int], scale: float):
    """Returns (dq, dk, dv, dRh_table, dRw_table)."""
    b, s, h, d = q.shape
    gh, gw = hw
    block = _pick_block(s, gw)
    nblk = s // block
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    of, gf = _fold(out), _fold(g)
    dcap = jnp.sum(of.astype(jnp.float32) * gf.astype(jnp.float32),
                   axis=-1).reshape(b * h, nblk, block)
    rh_term, rw_term = relpos_terms(q, rel_pos_h, rel_pos_w, hw)
    rhf = rh_term.reshape(b * h, nblk, block, gh).transpose(0, 1, 3, 2)
    rwf = rw_term.reshape(b * h, nblk, block, gw).transpose(0, 1, 3, 2)
    interp = jax.default_backend() != "tpu"

    dq_kernel = functools.partial(_dq_kernel, scale=scale, block_k=block,
                                  grid_h=gh, grid_w=gw, kv_len=s)
    dq, drh_t, drw = pl.pallas_call(
        dq_kernel,
        grid=(b * h, s // block),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gh, block), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gw, block), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, block), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, block), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gh, block), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gw, block), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, nblk, gh, block), jnp.float32),
            jax.ShapeDtypeStruct((b * h, nblk, gw, block), jnp.float32),
        ),
        interpret=interp,
    )(qf, kf, vf, rhf, rwf, gf, lse, dcap)

    dkv_kernel = functools.partial(_dkv_kernel, scale=scale, block_q=block,
                                   grid_h=gh, grid_w=gw, q_len=s)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, s // block),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, gh, block), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, gw, block), lambda i, j: (i, 0, 0, 0),
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
    )(qf, kf, vf, rhf, rwf, gf, lse, dcap)

    # assemble host-side contractions (grid-major -> row-major)
    d_rh = drh_t.transpose(0, 1, 3, 2).reshape(b, h, s, gh)
    d_rw = drw.transpose(0, 1, 3, 2).reshape(b, h, s, gw)
    Rh, Rw = gather_rel_tables(rel_pos_h, rel_pos_w, gh, gw)

    # q also feeds the bias: dq += einsum(d_rh, Rh) + einsum(d_rw, Rw)
    r_drh = d_rh.reshape(b, h, gh, gw, gh)
    r_drw = d_rw.reshape(b, h, gh, gw, gw)
    dq_bias_h = jnp.einsum("bnhwk,hkc->bhwnc", r_drh,
                           Rh.astype(jnp.float32))
    dq_bias_w = jnp.einsum("bnhwk,wkc->bhwnc", r_drw,
                           Rw.astype(jnp.float32))
    dq_extra = (dq_bias_h + dq_bias_w).reshape(b, gh * gw, h, d)
    dq_total = _unfold(dq, b, h).astype(jnp.float32) + dq_extra

    # table gradients: dRh[h, kh, c] = sum_{b,n,w} d_rh * q
    r_q = q.astype(jnp.float32).reshape(b, gh, gw, h, d)
    dRh_g = jnp.einsum("bnhwk,bhwnc->hkc", r_drh, r_q)
    dRw_g = jnp.einsum("bnhwk,bhwnc->wkc", r_drw, r_q)
    # scatter back through the static gather indices
    idx_h = rel_pos_index(gh, gh)
    idx_w = rel_pos_index(gw, gw)
    dRh = jnp.zeros_like(rel_pos_h, dtype=jnp.float32).at[idx_h].add(dRh_g)
    dRw = jnp.zeros_like(rel_pos_w, dtype=jnp.float32).at[idx_w].add(dRw_g)

    return (dq_total.astype(q.dtype), _unfold(dk, b, h), _unfold(dv, b, h),
            dRh.astype(rel_pos_h.dtype), dRw.astype(rel_pos_w.dtype))


# ---------------------------------------------------------------------------
# custom-vjp op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def relpos_flash_attention(q, k, v, rel_pos_h, rel_pos_w,
                           hw: Tuple[int, int]):
    scale = 1.0 / math.sqrt(q.shape[-1])
    rh, rw = relpos_terms(q, rel_pos_h, rel_pos_w, hw)
    out, _ = relpos_flash_fwd_lse(q, k, v, rh, rw, hw, scale)
    return out


def _rp_fwd(q, k, v, rel_pos_h, rel_pos_w, hw):
    scale = 1.0 / math.sqrt(q.shape[-1])
    rh, rw = relpos_terms(q, rel_pos_h, rel_pos_w, hw)
    out, lse = relpos_flash_fwd_lse(q, k, v, rh, rw, hw, scale)
    # residual saved 2-D: (BH, S, 1) tiles its minor dim to 128 lanes
    # (128x padding) and one copy per SAM block stays live until backward
    return out, (q, k, v, rel_pos_h, rel_pos_w, out, lse)


def _rp_bwd(hw, res, g):
    q, k, v, rel_pos_h, rel_pos_w, out, lse = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    return relpos_flash_bwd(q, k, v, rel_pos_h, rel_pos_w, out,
                            lse, g, hw, scale)


relpos_flash_attention.defvjp(_rp_fwd, _rp_bwd)
