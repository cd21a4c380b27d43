"""SAM ViTDet attention with decomposed rel-pos, fused on TPU.

The reference adds decomposed relative-position bias by materializing the
full (B*heads, S, S) attention matrix (`image_encoder.py:420-458`). The
S x S bias itself decomposes as

    bias[(qh, qw), (kh, kw)] = rel_h_term[(qh, qw), kh] + rel_w_term[(qh, qw), kw]

with rel_h_term = einsum(q, Rh) of shape (S, grid_h) and rel_w_term likewise
— tiny compared to S x S. The Pallas kernel streams kv blocks (block_k a
multiple of the grid width) and reconstructs each bias block on the fly from
those two small tensors with repeat/tile, so the S x S bias never touches
HBM. Falls back to the XLA path off-TPU or for non-conforming shapes.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634
# The grouped kernels compute softmax as exp2(logits - EXP2_SHIFT) with
# logits pre-multiplied by log2(e) OUTSIDE the kernel (folded into q's
# scale and the rel tables). Subtracting a CONSTANT power of two instead
# of the per-row max drops the most expensive VPU pass (a full (S, S)
# lane-reduction) and is numerically EXACT vs max-subtraction — a 2^-C
# shift only changes float exponents — until terms more than ~96 binades
# below 2^EXP2_SHIFT underflow, which softmax discards anyway. The only
# failure mode is every logit sitting below 2^(EXP2_SHIFT-126) (an
# all-underflow row -> denom guard returns zeros); post-LN attention
# logits are orders of magnitude inside the safe range.
EXP2_SHIFT = 32.0


def relpos_terms(q, rel_pos_h, rel_pos_w, hw: Tuple[int, int]):
    """q: (B, S, H, D) unscaled -> (B, H, S, gh), (B, H, S, gw)."""
    h, w = hw
    b, s, nh, d = q.shape
    from .sam_encoder_tables import gather_rel_tables  # lazy, avoids cycle
    Rh, Rw = gather_rel_tables(rel_pos_h, rel_pos_w, h, w)
    r_q = q.reshape(b, h, w, nh, d)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, Rw.astype(q.dtype))
    return (rel_h.reshape(b, nh, s, h), rel_w.reshape(b, nh, s, w))


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, scale: float,
            block_k: int, grid_w: int, kv_len: int):
    dt = q_ref.dtype               # dots in the input dtype (bf16 on the
    q = q_ref[0]                   # MXU fast path), f32 accumulation
    block_q, d = q.shape
    rw = rw_ref[0]                                    # (bq, gw)
    rows_per_block = block_k // grid_w

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_kv = kv_len // block_k

    def body(ki, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        # bias block via 0/1 expansion matmuls (interleaving reshapes and
        # lane-dim dynamic slices both crash Mosaic here; selector-matrix
        # matmuls from iota comparisons ride the MXU instead):
        #   bias_h = rh_blk^T @ E,  E[r, c] = [c // w == r]
        #   bias_w = rw      @ T,   T[x, c] = [c %  w == x]
        # rh comes in transposed (gh, bq) so the kv-row slice is on the
        # SUBLANE dim (dynamic sublane slices are supported).
        rh_blk = rh_ref[0, pl.ds(ki * rows_per_block, rows_per_block), :]
        col = jax.lax.broadcasted_iota(jnp.int32,
                                       (rows_per_block, block_k), 1)
        row = jax.lax.broadcasted_iota(jnp.int32,
                                       (rows_per_block, block_k), 0)
        expand_rows = (col // grid_w == row).astype(dt)
        colw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, block_k), 1)
        xw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, block_k), 0)
        expand_cols = (colw % grid_w == xw).astype(dt)
        bias_h = jax.lax.dot_general(
            rh_blk, expand_rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, bk)
        bias_w = jnp.dot(rw, expand_cols,
                         preferred_element_type=jnp.float32)
        s = s + bias_h + bias_w
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.dot(p.astype(dt), v,
                                       preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hw", "block_q", "block_k"))
def flash_attention_relpos(q, k, v, rel_h_term, rel_w_term,
                           hw: Tuple[int, int], block_q: int = 256,
                           block_k: int = 256):
    """q/k/v: (B, S, H, D); rel terms (B, H, S, gh/gw). Non-causal."""
    b, s, nh, d = q.shape
    gh, gw = hw
    scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    assert s % block_q == 0 and s % block_k == 0 and block_k % gw == 0

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * nh, s, -1)

    qf, kf, vf = fold(q), fold(k), fold(v)
    # rel_h transposed to (B*, gh, S): the kernel slices kv rows on the
    # sublane dim (lane-dim dynamic slices are unsupported)
    rhf = rel_h_term.reshape(b * nh, s, gh).transpose(0, 2, 1)
    rwf = rel_w_term.reshape(b * nh, s, gw)

    kernel = functools.partial(_kernel, scale=scale, block_k=block_k,
                               grid_w=gw, kv_len=s)
    out = pl.pallas_call(
        kernel,
        grid=(b * nh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gh, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, gw), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nh, s, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf, rhf, rwf)
    return out.reshape(b, nh, s, d).transpose(0, 2, 1, 3)


def _grouped_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                    scale: float, grid_h: int, grid_w: int, group: int):
    """One-pass attention for G window-heads per grid cell.

    The flash kernel above pays per-grid-cell overhead on (4608, 7) tiny
    cells for SAM's 196-token windows (measured ~11 ms for 56 GFLOP —
    ~5 TF/s); at S<=256 the whole window fits VMEM, so this kernel does a
    plain full-S softmax and amortizes the cell overhead over `group`
    window-heads via an in-cell loop."""
    s = q_ref.shape[1]
    rows_per = s // grid_h

    col = jax.lax.broadcasted_iota(jnp.int32, (grid_h, s), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (grid_h, s), 0)
    expand_rows = (col // grid_w == row).astype(jnp.float32)
    colw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, s), 1)
    xw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, s), 0)
    expand_cols = (colw % grid_w == xw).astype(jnp.float32)

    dt = q_ref.dtype                   # matmuls ride the MXU in the input
    expand_rows = expand_rows.astype(dt)   # dtype (bf16 in production) with
    expand_cols = expand_cols.astype(dt)   # fp32 accumulation; fp32 inputs
                                           # (tests) stay fp32 throughout

    def per(g, _):
        q = q_ref[g]                                   # (s, d)
        k = k_ref[g]
        v = v_ref[g]
        logits = jax.lax.dot_general(                  # q @ k^T, no
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),  # transpose op
            preferred_element_type=jnp.float32) * scale
        bias_h = jax.lax.dot_general(
            rh_ref[g], expand_rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (s, s)
        bias_w = jnp.dot(rw_ref[g], expand_cols,
                         preferred_element_type=jnp.float32)
        logits = logits + bias_h + bias_w
        # classic max-subtracted softmax: the exp2 constant-shift form
        # used by the v2 kernel was tried here and blew the 16 MB scoped
        # VMEM at the S=1024 global shape (the bf16 p + f32 sum-convert
        # temps outweigh the dropped max); 4 global blocks aren't worth
        # a tighter rewrite
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        # normalize AFTER the PV dot (see _grouped_kernel_v2): one
        # (s, d) divide instead of an (s, s) pass
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o_ref[g] = (jnp.dot(p.astype(dt), v,
                            preferred_element_type=jnp.float32)
                    / denom).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, per, 0)


@functools.partial(jax.jit, static_argnames=("hw", "group"))
def grouped_window_attention_relpos(q, k, v, rel_h_term, rel_w_term,
                                    hw: Tuple[int, int], group: int = 16):
    """Windowed SAM attention, one softmax pass, G window-heads per cell.

    q/k/v: (B, S, H, D) with B = #windows, S = win*win. rel terms as in
    `relpos_terms`."""
    b, s, nh, d = q.shape
    gh, gw = hw
    scale = 1.0 / math.sqrt(d)
    n = b * nh
    while n % group != 0:
        group //= 2

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(n, s, -1)

    qf, kf, vf = fold(q), fold(k), fold(v)
    rhf = rel_h_term.reshape(n, s, gh).transpose(0, 2, 1)
    rwf = rel_w_term.reshape(n, s, gw)

    kernel = functools.partial(_grouped_kernel, scale=scale, grid_h=gh,
                               grid_w=gw, group=group)
    out = pl.pallas_call(
        kernel,
        grid=(n // group,),
        in_specs=[
            pl.BlockSpec((group, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, gh, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, gw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf, rhf, rwf)
    return out.reshape(b, nh, s, d).transpose(0, 2, 1, 3)


def _folded_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                   scale: float, grid_h: int, grid_w: int, group: int):
    """Bias-folded variant: the decomposed rel-pos bias rides INSIDE the
    QK contraction instead of being two extra K=14 dots + two full-logits
    VPU adds per head (the v1 kernel above).

        [q*scale | rel_h_term | rel_w_term] @ [k | 1h(r//gw) | 1h(r%gw)]^T
      = scale*qk^T + rel_h_term[q, k//gw] + rel_w_term[q, k%gw]

    exactly, because the one-hot blocks select the bias columns. One
    (S, D+gh+gw) x (D+gh+gw, S) dot per window-head replaces three dots
    and two (S, S) adds; D=80 -> K=108 also sits closer to the MXU's
    128-lane contraction.

    Measured at the SAM-H windowed shape (288x196x16x80, bf16,
    benchmarks/sam_folded_probe.py): 6.5-7.1 ms vs the grouped v1
    kernel's 7.7 — folding wins in this head-folded layout, but the
    raw-layout v2 path (4.0 ms, no fold transposes) beats both, so this
    stays a documented experiment, not a dispatch target."""
    s = q_ref.shape[1]
    dt = q_ref.dtype
    row = jax.lax.broadcasted_iota(jnp.int32, (s, grid_h), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, grid_h), 1)
    oh_h = (row // grid_w == col).astype(dt)            # (s, gh)
    roww = jax.lax.broadcasted_iota(jnp.int32, (s, grid_w), 0)
    colw = jax.lax.broadcasted_iota(jnp.int32, (s, grid_w), 1)
    oh_w = (roww % grid_w == colw).astype(dt)           # (s, gw)

    def per(g, _):
        qa = jnp.concatenate(
            [q_ref[g] * jnp.asarray(scale, dt), rh_ref[g], rw_ref[g]],
            axis=-1)                                    # (s, d+gh+gw)
        ka = jnp.concatenate([k_ref[g], oh_h, oh_w], axis=-1)
        logits = jax.lax.dot_general(
            qa, ka, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[g] = jnp.dot(p.astype(dt), v_ref[g],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, per, 0)


@functools.partial(jax.jit, static_argnames=("hw", "group"))
def folded_window_attention_relpos(q, k, v, rel_h_term, rel_w_term,
                                   hw: Tuple[int, int], group: int = 16):
    """Windowed/global SAM attention with the rel-pos bias folded into the
    QK contraction (see `_folded_kernel`). Same contract as
    `grouped_window_attention_relpos`."""
    b, s, nh, d = q.shape
    gh, gw = hw
    scale = 1.0 / math.sqrt(d)
    n = b * nh
    while n % group != 0:
        group //= 2

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(n, s, -1)

    qf, kf, vf = fold(q), fold(k), fold(v)
    rhf = rel_h_term.reshape(n, s, gh)
    rwf = rel_w_term.reshape(n, s, gw)

    kernel = functools.partial(_folded_kernel, scale=scale, grid_h=gh,
                               grid_w=gw, group=group)
    out = pl.pallas_call(
        kernel,
        grid=(n // group,),
        in_specs=[
            pl.BlockSpec((group, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, gh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, gw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf, rhf, rwf)
    return out.reshape(b, nh, s, d).transpose(0, 2, 1, 3)


def _grouped_kernel_v2(q_ref, k_ref, v_ref, r_ref, *rest,
                       scale: float, grid_h: int, grid_w: int,
                       group: int, heads: int, head_dim: int,
                       quantize: bool = False):
    """Layout-preserving variant: blocks are (G, S, H*D) — the raw dense
    outputs — with heads split by STATIC lane slices inside the kernel,
    so the (B*H, S, D) fold/unfold transposes (~2 GB of HBM churn per
    call at SAM-H shapes) never happen.

    The decomposed rel-pos bias rides ONE dot per head: r_ref packs
    [rel_h_term | rel_w_term] per head on lanes ((G, S, H*(gh+gw))) and
    the combined 0/1 expansion matrix stacks the row/col selectors, so

        bias = [rh | rw] @ [[E_rows], [E_cols]]
             = rel_h_term[q, k//gw] + rel_w_term[q, k%gw]

    exactly. vs the previous two K=14 bias dots this cuts the per-head
    MXU passes from 16 to 12 (each K<=128 dot costs a full 128-lane
    contraction pass regardless of K). The kernel is VPU-bound on the
    (S, S) f32 softmax passes, so the bigger win is the exp2
    constant-shift form (see EXP2_SHIFT): no scale multiply, no max
    lane-reduction.

    `quantize=True` (serving W8A8-static): an extra SMEM scalar operand
    carries 1/act_scale and the epilogue emits the proj's int8 input
    directly — the bf16 attention output never reaches HBM, the
    window-unpartition that follows moves half the bytes, and the
    standalone quantize pass before proj disappears."""
    if quantize:
        inv_ref, o_ref = rest
    else:
        (o_ref,) = rest
    s = q_ref.shape[1]
    dt = q_ref.dtype
    gs = grid_h + grid_w

    col = jax.lax.broadcasted_iota(jnp.int32, (grid_h, s), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (grid_h, s), 0)
    expand_rows = (col // grid_w == row).astype(dt)     # (gh, s)
    colw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, s), 1)
    xw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, s), 0)
    expand_cols = (colw % grid_w == xw).astype(dt)      # (gw, s)
    expand = jnp.concatenate([expand_rows, expand_cols], axis=0)
    ones8 = jnp.ones((s, 8), dt)   # denominator rides the MXU (col 0)

    def per(g, _):
        qf = q_ref[g]                          # (s, heads*head_dim)
        kf = k_ref[g]
        vf = v_ref[g]
        rf = r_ref[g]                          # (s, heads*(gh+gw))
        # heads unrolled in python: the lane slices must be STATIC
        # (dynamic lane slicing is unsupported in Mosaic); per-head
        # stores keep at most one (s, s) logits temp live
        for h in range(heads):
            q = qf[:, h * head_dim:(h + 1) * head_dim]
            k = kf[:, h * head_dim:(h + 1) * head_dim]
            v = vf[:, h * head_dim:(h + 1) * head_dim]
            rhw = rf[:, h * gs:(h + 1) * gs]           # (s, gh+gw)
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            bias = jnp.dot(rhw, expand,
                           preferred_element_type=jnp.float32)
            logits = logits + bias
            # exp2 with a constant power-of-two shift — no scale mul and
            # no max pass; exact (see EXP2_SHIFT). scale*log2e rides in
            # q / the rel terms (wrapper). p lands directly in the dot
            # dtype so the whole (S, S) elementwise chain is ONE pass.
            p = jnp.exp2(logits - EXP2_SHIFT).astype(dt)
            # denominator via the MXU (p @ ones, one extra N-tile) —
            # cheaper than a (S, S) lane-reduction on the VPU; precision
            # matches the PV dot (same bf16-rounded p, f32 accumulate)
            denom = jax.lax.dot_general(
                p, ones8, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, 0:1]
            # normalize AFTER the PV dot: divides an (s, d) tile instead
            # of the (s, s) probability matrix (2.45x fewer elements at
            # s=196, d=80)
            out = (jnp.dot(p, v, preferred_element_type=jnp.float32)
                   / jnp.maximum(denom, 1e-30))
            if quantize:
                out = jnp.clip(jnp.round(out * inv_ref[0]), -127.0, 127.0)
            o_ref[g, :, h * head_dim:(h + 1) * head_dim] = \
                out.astype(o_ref.dtype)
        return 0

    # fori (not python-unrolled): unrolling the group loop was measured
    # at 15.0 ms vs 14.2 at the b16 shape — Mosaic keeps every unrolled
    # chain's (s, s) f32 logits temp live (34 MB scoped VMEM at group 4,
    # compile error), with no pipelining win to show for it
    jax.lax.fori_loop(0, group, per, 0)


def _grouped_kernel_v3(qkv_ref, r_ref, *rest, scale: float, grid_h: int,
                       grid_w: int, group: int, heads: int, head_dim: int,
                       quantize: bool = False):
    """v2 with the FUSED qkv block as one operand: (G, S, 3*H*D) straight
    from the qkv projection. The jnp.split(qkv, 3) the v2 layout forced
    was pure data movement — profiled 1.57 ms per windowed block at 32
    frames (28 three-output (288, 196, 1280) fusions, ~176 ms of a b16
    SAM stage) plus a 15.3 ms/iter layout copy on the operand XLA chose
    a {0,2,1} layout for. Heads AND q/k/v are sliced by static lane
    offsets in VMEM instead. q's pre-softmax scale (scale * log2e for
    the exp2 form) moves in-kernel as a per-head (S, D) multiply —
    bit-identical to the wrapper's old bf16 pre-multiply."""
    if quantize:
        inv_ref, o_ref = rest
    else:
        (o_ref,) = rest
    s = qkv_ref.shape[1]
    dt = qkv_ref.dtype
    gs = grid_h + grid_w
    c = heads * head_dim

    col = jax.lax.broadcasted_iota(jnp.int32, (grid_h, s), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (grid_h, s), 0)
    expand_rows = (col // grid_w == row).astype(dt)     # (gh, s)
    colw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, s), 1)
    xw = jax.lax.broadcasted_iota(jnp.int32, (grid_w, s), 0)
    expand_cols = (colw % grid_w == xw).astype(dt)      # (gw, s)
    expand = jnp.concatenate([expand_rows, expand_cols], axis=0)
    ones8 = jnp.ones((s, 8), dt)
    qscale = jnp.asarray(scale * LOG2E, dt)

    def per(g, _):
        fused = qkv_ref[g]                     # (s, 3*heads*head_dim)
        rf = r_ref[g]                          # (s, heads*(gh+gw))
        for h in range(heads):
            q = fused[:, h * head_dim:(h + 1) * head_dim] * qscale
            k = fused[:, c + h * head_dim:c + (h + 1) * head_dim]
            v = fused[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
            rhw = rf[:, h * gs:(h + 1) * gs]           # (s, gh+gw)
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            bias = jnp.dot(rhw, expand,
                           preferred_element_type=jnp.float32)
            p = jnp.exp2(logits + bias - EXP2_SHIFT).astype(dt)
            denom = jax.lax.dot_general(
                p, ones8, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, 0:1]
            out = (jnp.dot(p, v, preferred_element_type=jnp.float32)
                   / jnp.maximum(denom, 1e-30))
            if quantize:
                out = jnp.clip(jnp.round(out * inv_ref[0]), -127.0, 127.0)
            o_ref[g, :, h * head_dim:(h + 1) * head_dim] = \
                out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, per, 0)


@functools.partial(jax.jit, static_argnames=("hw", "num_heads", "group",
                                             "quantize"))
def grouped_window_attention_relpos_v3(qkv, rel_packed, inv_scale,
                                       hw: Tuple[int, int],
                                       num_heads: int, group: int = 2,
                                       quantize: bool = False):
    """qkv: (B, S, 3*H*D) fused projection output (B = #windows).
    rel_packed as from `relpos_terms_raw` on the q THIRD of qkv.
    `quantize` emits int8 via the static-scale epilogue (`inv_scale`:
    scalar 1/act_scale); else bf16 (inv_scale ignored)."""
    b, s, c3 = qkv.shape
    gh, gw = hw
    c = c3 // 3
    hd = c // num_heads
    scale = 1.0 / math.sqrt(hd)
    while b % group != 0:
        group //= 2

    rel_packed = (rel_packed
                  * jnp.asarray(LOG2E, rel_packed.dtype)).astype(
                      rel_packed.dtype)

    kernel = functools.partial(_grouped_kernel_v3, scale=scale, grid_h=gh,
                               grid_w=gw, group=group, heads=num_heads,
                               head_dim=hd, quantize=quantize)
    in_specs = [
        pl.BlockSpec((group, s, c3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, s, num_heads * (gh + gw)),
                     lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qkv, rel_packed]
    if quantize:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(inv_scale.astype(jnp.float32).reshape(1))
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, s, c), jnp.int8 if quantize else qkv.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def relpos_terms_raw(q, rel_pos_h, rel_pos_w, hw: Tuple[int, int],
                     num_heads: int):
    """Rel terms straight in the v2 kernel's packed lane layout.

    q: (B, S, H*D) raw projection output. Returns (B, S, H*(gh+gw)) =
    per head [rel_h_term | rel_w_term] concatenated on lanes.

    vs `relpos_terms` + transpose: the einsums here BATCH over the query
    row/col ("bxwnc,xkc->bxwnk": batch x), so the operand is a free
    bitcast view of raw q and the output is already (b, qh, qw, h, k)
    row-major — no (B, H, S, g) materialization and no
    (0, 2, 1, 3) transposes (profiled ~85 ms of fusion+copy per b16 SAM
    forward producing the old layout)."""
    h, w = hw
    b, s, c = q.shape
    hd = c // num_heads
    from .sam_encoder_tables import gather_rel_tables  # lazy, avoids cycle
    Rh, Rw = gather_rel_tables(rel_pos_h, rel_pos_w, h, w)
    r_q = q.reshape(b, h, w, num_heads, hd)           # free view of raw q
    rel_h = jnp.einsum("bxwnc,xkc->bxwnk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bxwnc,wkc->bxwnk", r_q, Rw.astype(q.dtype))
    packed = jnp.concatenate([rel_h, rel_w], axis=-1)  # (b,h,w,nh,gh+gw)
    return packed.reshape(b, s, num_heads * (h + w))


@functools.partial(jax.jit, static_argnames=("hw", "num_heads", "group"))
def grouped_window_attention_relpos_v2(q, k, v, rel_packed,
                                       hw: Tuple[int, int],
                                       num_heads: int, group: int = 8):
    """q/k/v: (B, S, H*D) raw projection outputs (B = #windows).
    rel_packed as produced by `relpos_terms_raw` ((B, S, H*(gh+gw)))."""
    b, s, c = q.shape
    gh, gw = hw
    hd = c // num_heads
    scale = 1.0 / math.sqrt(hd)
    while b % group != 0:
        group //= 2

    # scale*log2e folds into q, log2e into the packed rel terms (both
    # fuse into their XLA producers in-model); the kernel then runs exp2
    # with no scale multiply and no max pass — see EXP2_SHIFT
    q = (q * jnp.asarray(scale * LOG2E, q.dtype)).astype(q.dtype)
    rel_packed = (rel_packed
                  * jnp.asarray(LOG2E, rel_packed.dtype)).astype(
                      rel_packed.dtype)

    kernel = functools.partial(_grouped_kernel_v2, scale=scale, grid_h=gh,
                               grid_w=gw, group=group, heads=num_heads,
                               head_dim=hd)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, num_heads * (gh + gw)),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, rel_packed)


@functools.partial(jax.jit, static_argnames=("hw", "num_heads", "group"))
def grouped_window_attention_relpos_v2_q8(q, k, v, rel_packed, inv_scale,
                                          hw: Tuple[int, int],
                                          num_heads: int, group: int = 8):
    """v2 kernel with the int8 epilogue (see `_grouped_kernel_v2`,
    quantize=True): returns round(out / act_scale) as int8 (B, S, H*D).
    `inv_scale`: (1,) f32 = 1 / act_scale (per-tensor static)."""
    b, s, c = q.shape
    gh, gw = hw
    hd = c // num_heads
    scale = 1.0 / math.sqrt(hd)
    while b % group != 0:
        group //= 2

    q = (q * jnp.asarray(scale * LOG2E, q.dtype)).astype(q.dtype)
    rel_packed = (rel_packed
                  * jnp.asarray(LOG2E, rel_packed.dtype)).astype(
                      rel_packed.dtype)

    kernel = functools.partial(_grouped_kernel_v2, scale=scale, grid_h=gh,
                               grid_w=gw, group=group, heads=num_heads,
                               head_dim=hd, quantize=True)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, num_heads * (gh + gw)),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), jnp.int8),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, rel_packed, inv_scale.astype(jnp.float32).reshape(1))


def sam_window_attention_raw_q8(q, k, v, rel_pos_h, rel_pos_w,
                                hw: Tuple[int, int], num_heads: int,
                                act_scale):
    """Inference-only windowed SAM attention emitting the proj's int8
    input directly (W8A8-static serving). Same contract as
    `sam_window_attention_raw` but returns int8 quantized with the
    per-tensor `act_scale` (the proj's calibrated input scale). No VJP:
    the W8A8-static path never trains."""
    rel = relpos_terms_raw(q, rel_pos_h, rel_pos_w, hw, num_heads)
    inv = 1.0 / jnp.maximum(act_scale.astype(jnp.float32), 1e-12)
    return grouped_window_attention_relpos_v2_q8(q, k, v, rel, inv, hw,
                                                 num_heads, group=2)


def sam_window_attention_fused_q8(qkv, rel_pos_h, rel_pos_w,
                                  hw: Tuple[int, int], num_heads: int,
                                  act_scale):
    """`sam_window_attention_raw_q8` on the UNSPLIT qkv projection
    output (nW, S, 3C): the v3 kernel slices q/k/v by static lane
    offsets in VMEM, so the three-way split (profiled ~176 ms of pure
    copies per b16 SAM stage) never runs. Returns int8 (nW, S, C)."""
    c = qkv.shape[-1] // 3
    rel = relpos_terms_raw(qkv[..., :c], rel_pos_h, rel_pos_w, hw,
                           num_heads)
    inv = 1.0 / jnp.maximum(act_scale.astype(jnp.float32), 1e-12)
    return grouped_window_attention_relpos_v3(qkv, rel, inv, hw,
                                              num_heads, group=2,
                                              quantize=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sam_window_attention_fused(qkv, rel_pos_h, rel_pos_w,
                               hw: Tuple[int, int], num_heads: int):
    """Windowed SAM attention on the UNSPLIT qkv output, bf16 out.

    Forward = the v3 kernel (no q/k/v split, no fold transposes);
    backward splits the saved qkv and delegates to the fused flash
    fwd+bwd kernels exactly like `sam_window_attention_raw`'s VJP,
    concatenating the grads back."""
    c = qkv.shape[-1] // 3
    rel = relpos_terms_raw(qkv[..., :c], rel_pos_h, rel_pos_w, hw,
                           num_heads)
    return grouped_window_attention_relpos_v3(
        qkv, rel, jnp.float32(1.0), hw, num_heads, group=2,
        quantize=False)


def _fused_qkv_fwd(qkv, rel_pos_h, rel_pos_w, hw, num_heads):
    return (sam_window_attention_fused(qkv, rel_pos_h, rel_pos_w, hw,
                                       num_heads),
            (qkv, rel_pos_h, rel_pos_w))


def _fused_qkv_bwd(hw, num_heads, res, g):
    qkv, rel_pos_h, rel_pos_w = res
    _, vjp = jax.vjp(
        lambda qkv_, rh_, rw_: _window_raw_bwd_ref(
            qkv_, rh_, rw_, hw, num_heads), qkv, rel_pos_h, rel_pos_w)
    return vjp(g)


def _window_raw_bwd_ref(qkv, rel_pos_h, rel_pos_w, hw, num_heads):
    """Differentiable reference for the fused-qkv VJP: head-layout flash
    attention over the split qkv (same delegation as
    `_window_raw_bwd`)."""
    from .sam_attention_bwd import relpos_flash_attention
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads

    def head_layout(x):
        return x.reshape(b, s, num_heads, hd)

    return relpos_flash_attention(
        head_layout(qkv[..., :c]), head_layout(qkv[..., c:2 * c]),
        head_layout(qkv[..., 2 * c:]), rel_pos_h, rel_pos_w,
        hw).reshape(b, s, c)


sam_window_attention_fused.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


def _folded_kernel_v2(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                      scale: float, grid_h: int, grid_w: int,
                      group: int, heads: int, head_dim: int):
    """Raw-layout kernel with the bias folded into the QK contraction:
    per head, [q*scale | rh | rw] @ [k | onehot_h | onehot_w]^T replaces
    the v2 kernel's three dots + two (S, S) adds (see `_folded_kernel`
    for the identity). Blocks are (G, S, H*D) raw projection outputs as
    in `_grouped_kernel_v2`.

    Measured (288x196x16x80 bf16, group 2): 4.5 ms vs plain v2's 4.0 —
    the per-head (S, 108) concat copies cost more than the two K=14 dots
    + adds they replace, so plain v2 remains the dispatched kernel."""
    s = q_ref.shape[1]
    dt = q_ref.dtype

    row = jax.lax.broadcasted_iota(jnp.int32, (s, grid_h), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, grid_h), 1)
    oh_h = (row // grid_w == col).astype(dt)            # (s, gh)
    roww = jax.lax.broadcasted_iota(jnp.int32, (s, grid_w), 0)
    colw = jax.lax.broadcasted_iota(jnp.int32, (s, grid_w), 1)
    oh_w = (roww % grid_w == colw).astype(dt)           # (s, gw)

    def per(g, _):
        qf = q_ref[g]                          # (s, heads*head_dim)
        kf = k_ref[g]
        vf = v_ref[g]
        rhf = rh_ref[g]                        # (s, heads*gh)
        rwf = rw_ref[g]
        for h in range(heads):
            q = qf[:, h * head_dim:(h + 1) * head_dim]
            k = kf[:, h * head_dim:(h + 1) * head_dim]
            v = vf[:, h * head_dim:(h + 1) * head_dim]
            rh = rhf[:, h * grid_h:(h + 1) * grid_h]
            rw = rwf[:, h * grid_w:(h + 1) * grid_w]
            qa = jnp.concatenate([q * jnp.asarray(scale, dt), rh, rw],
                                 axis=-1)      # (s, d+gh+gw)
            ka = jnp.concatenate([k, oh_h, oh_w], axis=-1)
            logits = jax.lax.dot_general(
                qa, ka, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            # normalize AFTER the PV dot: divides an (s, d) tile instead
            # of the (s, s) probability matrix (2.45x fewer elements at
            # s=196, d=80), and the f32 division after the bf16 dot is
            # slightly MORE accurate than normalizing bf16 inputs
            denom = jnp.sum(p, axis=-1, keepdims=True)
            out = jnp.dot(p.astype(dt), v,
                          preferred_element_type=jnp.float32) / denom
            o_ref[g, :, h * head_dim:(h + 1) * head_dim] = \
                out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, per, 0)


@functools.partial(jax.jit, static_argnames=("hw", "num_heads", "group"))
def folded_window_attention_relpos_v2(q, k, v, rel_h_term, rel_w_term,
                                      hw: Tuple[int, int],
                                      num_heads: int, group: int = 2):
    """Raw-layout folded-bias attention. Same contract as
    `grouped_window_attention_relpos_v2`: q/k/v (B, S, H*D), rel terms
    (B, H, S, gh/gw)."""
    b, s, c = q.shape
    gh, gw = hw
    hd = c // num_heads
    scale = 1.0 / math.sqrt(hd)
    while b % group != 0:
        group //= 2
    rhf = rel_h_term.transpose(0, 2, 1, 3).reshape(b, s, num_heads * gh)
    rwf = rel_w_term.transpose(0, 2, 1, 3).reshape(b, s, num_heads * gw)

    kernel = functools.partial(_folded_kernel_v2, scale=scale, grid_h=gh,
                               grid_w=gw, group=group, heads=num_heads,
                               head_dim=hd)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, num_heads * gh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s, num_heads * gw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, rhf, rwf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def sam_window_attention_raw(q, k, v, rel_pos_h, rel_pos_w,
                             hw: Tuple[int, int], num_heads: int):
    """Windowed SAM attention on RAW projection layout.

    q/k/v: (nW, S, H*D) straight from the qkv split — heads are NOT
    folded into the batch dim. The v2 kernel splits heads by static lane
    slices in VMEM, so the (B*H, S, D) fold/unfold transposes (~4.5 ms of
    HBM churn per SAM-H block, measured) never reach HBM. Fastest
    windowed variant on chip: 17.4 ms/block vs 24.3 for the fold-based
    path (benchmarks/sam_layout_probe.py).

    Backward delegates to the fused flash fwd+bwd kernels in head layout
    (recompute-forward, remat style), with grads reshaped back to raw.
    """
    return _window_raw_fwd_impl(q, k, v, rel_pos_h, rel_pos_w, hw,
                                num_heads)


def _window_raw_fwd_impl(q, k, v, rel_pos_h, rel_pos_w, hw, num_heads):
    rel = relpos_terms_raw(q, rel_pos_h, rel_pos_w, hw, num_heads)
    return grouped_window_attention_relpos_v2(q, k, v, rel, hw,
                                              num_heads, group=2)


def _window_raw_fwd(q, k, v, rel_pos_h, rel_pos_w, hw, num_heads):
    return (_window_raw_fwd_impl(q, k, v, rel_pos_h, rel_pos_w, hw,
                                 num_heads),
            (q, k, v, rel_pos_h, rel_pos_w))


def _window_raw_bwd(hw, num_heads, res, g):
    from .sam_attention_bwd import relpos_flash_attention
    q, k, v, rel_pos_h, rel_pos_w = res
    b, s, c = q.shape
    hd = c // num_heads

    def head_layout(x):
        return x.reshape(b, s, num_heads, hd)

    _, vjp = jax.vjp(
        lambda q_, k_, v_, rh_, rw_: relpos_flash_attention(
            head_layout(q_), head_layout(k_), head_layout(v_),
            rh_, rw_, hw).reshape(b, s, c),
        q, k, v, rel_pos_h, rel_pos_w)
    return vjp(g)


sam_window_attention_raw.defvjp(_window_raw_fwd, _window_raw_bwd)


def _xla_relpos_attention(q, k, v, rel_pos_h, rel_pos_w,
                          hw: Tuple[int, int]):
    """Reference path: materialized decomposed-rel-pos bias + softmax."""
    from .attention import xla_attention
    from ..models.sam_encoder import decomposed_rel_pos_bias
    bias = decomposed_rel_pos_bias(q, rel_pos_h, rel_pos_w, hw)
    return xla_attention(q, k, v, bias=bias,
                         scale=1.0 / math.sqrt(q.shape[-1]))


def _fused_relpos_attention(q, k, v, rel_pos_h, rel_pos_w,
                            hw: Tuple[int, int]):
    h, w = hw
    s = q.shape[1]
    rh, rw = relpos_terms(q, rel_pos_h, rel_pos_w, hw)
    block_k = w
    while block_k * 2 <= min(s, 512) and s % (block_k * 2) == 0:
        block_k *= 2
    return flash_attention_relpos(q, k, v, rh, rw, hw,
                                  block_q=block_k, block_k=block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_with_vjp(q, k, v, rel_pos_h, rel_pos_w, hw):
    return _fused_relpos_attention(q, k, v, rel_pos_h, rel_pos_w, hw)


def _fused_fwd(q, k, v, rel_pos_h, rel_pos_w, hw):
    return (_fused_relpos_attention(q, k, v, rel_pos_h, rel_pos_w, hw),
            (q, k, v, rel_pos_h, rel_pos_w))


def _fused_bwd(hw, res, g):
    # backward recomputes through the XLA reference path (the Pallas forward
    # has no native VJP); numerics match since both compute the same fn.
    # lax.map over the batch axis serializes the S^2 attention buffers —
    # otherwise every global block's backward materializes (B, H, S, S)
    # simultaneously and a ViT-H train step OOMs a single chip.
    q, k, v, rel_pos_h, rel_pos_w = res

    def per_sample(args):
        qi, ki, vi, gi = args
        out, vjp = jax.vjp(
            lambda q_, k_, v_, rh_, rw_: _xla_relpos_attention(
                q_[None], k_[None], v_[None], rh_, rw_, hw)[0],
            qi, ki, vi, rel_pos_h, rel_pos_w)
        return vjp(gi)

    dq, dk, dv, drh, drw = jax.lax.map(per_sample, (q, k, v, g))
    return dq, dk, dv, drh.sum(0), drw.sum(0)


_fused_with_vjp.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _grouped_with_vjp(q, k, v, rel_pos_h, rel_pos_w, hw):
    rh, rw = relpos_terms(q, rel_pos_h, rel_pos_w, hw)
    # group caps VMEM: 16 window-heads of S<=256 fit; at the S=1024 global
    # shape only ~4 do (group 8 fails to compile; measured 10.9 ms at
    # group 4 vs 12.2+ for the flash path — benchmarks/sam_global_probe.py)
    group = 16 if q.shape[1] <= 256 else 4
    return grouped_window_attention_relpos(q, k, v, rh, rw, hw, group=group)


def _grouped_fwd(q, k, v, rel_pos_h, rel_pos_w, hw):
    return (_grouped_with_vjp(q, k, v, rel_pos_h, rel_pos_w, hw),
            (q, k, v, rel_pos_h, rel_pos_w))


def _grouped_bwd(hw, res, g):
    # delegate to the flash fwd+bwd kernels (recompute-forward, remat
    # style): the grouped kernel speeds the forward; the tested fused
    # backward (ops/sam_attention_bwd.py) keeps training numerics
    from .sam_attention_bwd import relpos_flash_attention
    q, k, v, rel_pos_h, rel_pos_w = res
    _, vjp = jax.vjp(
        lambda *a: relpos_flash_attention(*a, hw),
        q, k, v, rel_pos_h, rel_pos_w)
    return vjp(g)


_grouped_with_vjp.defvjp(_grouped_fwd, _grouped_bwd)


def sam_attention_with_relpos(q, k, v, rel_pos_h, rel_pos_w,
                              hw: Tuple[int, int], impl: str = "auto"):
    """Full SAM attention: q unscaled (B, S, H, D) -> (B, S, H, D).

    impl "auto" on TPU: windowed shapes (S <= 256, the 14x14=196 case) take
    the one-pass grouped kernel — the flash kernel's (B*H, S/28) grid is
    pure per-cell overhead there (measured ~5 TF/s); global shapes take the
    fused flash forward+backward kernels. Off-TPU / non-conforming shapes
    fall back to the XLA bias-materializing path.
    """
    h, w = hw
    s = q.shape[1]
    conforming = s == h * w   # any grid: block selection handles alignment
    use_pallas = (impl == "pallas" or
                  (impl == "auto" and jax.default_backend() == "tpu"
                   and conforming))
    if use_pallas:
        if s <= 1024:
            # one full-S softmax per cell: kv read once, far fewer grid
            # cells than the flash path (whose (B*H, S/bq) grid is mostly
            # per-cell overhead at these sizes)
            return _grouped_with_vjp(q, k, v, rel_pos_h, rel_pos_w, hw)
        # fully fused: flash forward + flash backward (incl. rel-table
        # gradients) — see ops/sam_attention_bwd.py
        from .sam_attention_bwd import relpos_flash_attention
        return relpos_flash_attention(q, k, v, rel_pos_h, rel_pos_w, hw)
    return _xla_relpos_attention(q, k, v, rel_pos_h, rel_pos_w, hw)
