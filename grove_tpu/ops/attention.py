"""Attention ops: XLA reference path + Pallas TPU flash attention.

The reference's attention surface (flash-attn 2 CUDA for LLaMA
(`train.py:208`), eager bmm for CLIP (`modeling_clip.py:232-334`), eager with
decomposed rel-pos for SAM (`image_encoder.py:301-326`)) maps here to:

* `multi_head_attention` — one entry point; `impl="xla"` lowers to plain
  einsum+softmax (XLA fuses well, used for the short-sequence vision paths
  and as the CPU fallback), `impl="pallas"` calls the fused flash kernel
  (used for the LLaMA train/prefill path on TPU), `impl="auto"` picks.

All shapes are (batch, seq, heads, head_dim). Softmax is computed in fp32
regardless of input dtype.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_attention(q, k, v, *, causal: bool = False,
                  bias: Optional[jax.Array] = None,
                  mask: Optional[jax.Array] = None,
                  scale: Optional[float] = None) -> jax.Array:
    """Reference attention. q: (B, Sq, H, D); k/v: (B, Sk, H, D).

    bias: broadcastable to (B, H, Sq, Sk), added pre-softmax.
    mask: broadcastable to (B, H, Sq, Sk) bool; False = masked out.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        qpos = jnp.arange(sq)[:, None] + (sk - sq)
        kpos = jnp.arange(sk)[None, :]
        logits = jnp.where(kpos <= qpos, logits, -jnp.inf)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (TPU)
# ---------------------------------------------------------------------------

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, causal: bool, scale: float,
                  block_k: int, kv_len: int):
    """One (batch*head, q_block) program: online-softmax over kv blocks."""
    q = q_ref[0].astype(jnp.float32) * scale          # (bq, d)
    block_q = q.shape[0]
    qi = pl.program_id(1)
    q_offset = qi * block_q

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32)

    num_kv = pl.cdiv(kv_len, block_k)
    if causal:
        # last kv block that any query in this q block can see
        num_kv = jnp.minimum(num_kv,
                             pl.cdiv(q_offset + block_q, block_k))

    def body(ki, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        if causal:
            qpos = q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            kpos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(kpos <= qpos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m - m_new)
        l_new = l * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * correction + jnp.dot(
            p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q",
                                             "block_k"))
def flash_attention(q, k, v, *, causal: bool = False,
                    scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K) -> jax.Array:
    """Fused flash attention. q/k/v: (B, S, H, D) -> (B, Sq, H, D).

    Sequence lengths are padded up to block multiples internally; with
    `causal=True` right-padding needs no extra masking (pad keys are in the
    causal future of every real query).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, sq, h, d = q.shape
    sk = k.shape[1]

    block_q = min(block_q, max(sq, 16))
    block_k = min(block_k, max(sk, 16))
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    # non-causal with padded kv needs masking; fall back to padding keys with
    # -inf via explicit mask handled by padding v with zeros and k with a
    # value that yields NEG_INF logits -- simplest correct choice: pad then
    # mask inside kernel via kv_len.
    if not causal and pad_k:
        # Padded keys would need an extra in-kernel mask; the non-causal
        # users (vision towers) have short block-aligned sequences, so any
        # ragged case just takes the XLA path.
        return xla_attention(q, k, v, causal=False, scale=scale)

    qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))

    # (B, S, H, D) -> (B*H, S, D)
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = fold(qp), fold(kp), fold(vp)
    sq_p, sk_p = qf.shape[1], kf.shape[1]

    kernel = functools.partial(
        _flash_kernel, causal=causal, scale=scale, block_k=block_k,
        kv_len=sk)

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(b * h, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(b, h, sq_p, d).transpose(0, 2, 1, 3)
    return out[:, :sq]


# ---------------------------------------------------------------------------
# One-pass causal prefill attention on RAW (B, S, H*D) layout
# ---------------------------------------------------------------------------
#
# The LLM prefill (S ~ 624, D = 128, MHA) was paying for attention three
# times over (profiled at b16, benchmarks/prefill_breakdown.py):
#   * `flash_attention` pads 624 -> 1024 (block_q 512): 33 ms of pads and
#     64% wasted rows;
#   * the (B, S, H, D) -> (B*H, S, D) fold/unfold transposes: ~40 ms of
#     the 55 ms copy bucket;
#   * the serving path (int8-KV branch) took `xla_attention` with a
#     materialized mask — (B, H, S, S) f32 logits through HBM.
# At S <= ~1100 the whole (S, S) logits tile fits VMEM, so this kernel
# does ONE full-S softmax per (batch, head-group) cell — the same shape
# the SAM v2 kernel proved out — with heads split by static 128-aligned
# lane slices (D % 128 == 0), causal + left-pad masking fused on the
# logits, and no layout change anywhere: q/k/v blocks are free views of
# the RoPE output. Full-S does ~2x the causal-optimal QK FLOPs, but at
# S=624 that is ~20 ms of MXU time vs the ~100 ms of pads+copies+slow
# flash it replaces.


def _prefill_kernel(q_ref, k_ref, v_ref, pad_ref, o_ref, *, scale: float,
                    head_dim: int, heads_per_group: int):
    b = pl.program_id(0)
    pad = pad_ref[b]                                   # left-pad count
    s = q_ref.shape[1]
    dt = q_ref.dtype

    qpos = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    # causal over equal-length fresh q/k; left-pad slots masked except
    # self-attention (a fully-masked row softmaxes to NaN and poisons
    # later layers through its k/v — see LlamaAttention)
    valid = (kpos <= qpos) & ((kpos >= pad) | (kpos == qpos))

    for h in range(heads_per_group):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(valid, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = (jnp.dot(p.astype(dt), v,
                       preferred_element_type=jnp.float32)
               / jnp.maximum(denom, 1e-30))
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale"))
def prefill_attention_raw(q, k, v, pad_lens, num_heads: int,
                          scale: float) -> jax.Array:
    """Causal self-attention over fresh q/k/v in RAW (B, S, H*D) layout.

    pad_lens: (B,) int32 — number of leading key slots to mask per
    sample (0 = pure causal). Returns (B, S, H*D)."""
    b, s, c = q.shape
    hd = c // num_heads
    # head-group size: keep the 4 streamed blocks near ~2.5 MB so the
    # (S, S) f32 logits tile + bf16 p fit comfortably in VMEM
    hpg = num_heads
    while hpg > 1 and (4 * s * hpg * hd * 2 > 3 * 2 ** 20
                       or num_heads % hpg):
        hpg -= 1
    lanes = hpg * hd

    kernel = functools.partial(_prefill_kernel, scale=scale, head_dim=hd,
                               heads_per_group=hpg)
    return pl.pallas_call(
        kernel,
        grid=(b, num_heads // hpg),
        in_specs=[
            pl.BlockSpec((1, s, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, s, lanes), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, pad_lens.astype(jnp.int32))


def prefill_attention_ok(q_shape, num_heads: int) -> bool:
    """Eligibility: MHA head layout with 128-aligned lane slices and an
    (S, S) logits tile that fits VMEM next to the streamed blocks."""
    b, s, c = q_shape
    hd = c // num_heads
    return (hd % 128 == 0 and c == num_heads * hd and s % 8 == 0
            and 128 <= s <= 1100)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def prefill_attention_trainable(q, k, v, num_heads, scale):
    """`prefill_attention_raw` (pure causal) with a recompute backward
    through the XLA path, for the cache-free teacher-forced forward."""
    pad = jnp.zeros((q.shape[0],), jnp.int32)
    return prefill_attention_raw(q, k, v, pad, num_heads, scale)


def _prefill_fwd(q, k, v, num_heads, scale):
    return prefill_attention_trainable(q, k, v, num_heads, scale), (q, k, v)


def _prefill_bwd(num_heads, scale, res, g):
    q, k, v = res
    b, s, c = q.shape
    hd = c // num_heads

    def head(x):
        return x.reshape(b, s, num_heads, hd)

    _, vjp = jax.vjp(
        lambda q_, k_, v_: xla_attention(
            head(q_), head(k_), head(v_), causal=True,
            scale=scale).reshape(b, s, c), q, k, v)
    return vjp(g)


prefill_attention_trainable.defvjp(_prefill_fwd, _prefill_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_with_vjp(q, k, v, causal, scale):
    return flash_attention(q, k, v, causal=causal, scale=scale)


def _flash_fwd(q, k, v, causal, scale):
    return flash_attention(q, k, v, causal=causal, scale=scale), (q, k, v)


def _flash_bwd(causal, scale, res, g):
    # backward differentiates the XLA reference path (identical math);
    # a dedicated Pallas backward kernel is a planned optimization
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: xla_attention(q_, k_, v_, causal=causal,
                                         scale=scale), q, k, v)
    return vjp(g)


_flash_with_vjp.defvjp(_flash_fwd, _flash_bwd)


def _block_for(s: int) -> Optional[int]:
    for b in (512, 256, 128, 64):
        if s % b == 0:
            return b
    return None


# ---------------------------------------------------------------------------
# Grouped plain attention (non-causal self-attention, e.g. vision towers)
# ---------------------------------------------------------------------------
#
# The XLA path materializes the (B, H, Sq, Sk) f32 logits in HBM — at
# CLIP-L/336 full-scale shapes (32 imgs x 16 heads x 577^2) that is ~680 MB
# of traffic per layer. The flash kernel requires block-aligned S and
# d % 128 == 0. This kernel handles the ragged case: pad S to a sublane
# multiple, fold heads, one full-S softmax per grid cell with G heads per
# cell, padded keys masked by a static kv_len comparison. Logits never
# leave VMEM. Slope-timed fairly (all inputs carry-perturbed, output fully
# consumed — see benchmarks/_timing.py): 1.6 ms vs XLA's 2.46 ms at the
# CLIP shape (32, 577, 16, 64) on one v5e core.


def _grouped_plain_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                          group: int, kv_len: int):
    s_pad = q_ref.shape[1]
    dt = q_ref.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    kmask = col < kv_len

    def per(g, _):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kmask, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[g] = jnp.dot(p.astype(dt), v,
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, per, 0)


@functools.partial(jax.jit, static_argnames=("scale", "group"))
def grouped_plain_attention(q, k, v, *, scale: Optional[float] = None,
                            group: int = 8) -> jax.Array:
    """Non-causal self-attention, (B, S, H, D) -> (B, S, H, D), S == Sk.

    Handles S that is neither block-aligned nor 128-multiple (CLIP's 577).
    VMEM per cell ~ 8*group*S*D + 12*S^2 bytes; callers should keep
    group * S * D and S^2 modest (the auto dispatcher does).
    """
    b, s, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    s_pad = s + (-s) % 8
    pad = s_pad - s
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n = b * h
    while n % group != 0:
        group //= 2

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(n, s_pad, d)

    qf, kf, vf = fold(q), fold(k), fold(v)
    kernel = functools.partial(_grouped_plain_kernel, scale=scale,
                               group=group, kv_len=s)
    out = pl.pallas_call(
        kernel,
        grid=(n // group,),
        in_specs=[
            pl.BlockSpec((group, s_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, s_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s_pad, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    out = out.reshape(b, h, s_pad, d).transpose(0, 2, 1, 3)
    return out[:, :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _grouped_plain_with_vjp(q, k, v, scale):
    return grouped_plain_attention(q, k, v, scale=scale)


def _grouped_plain_fwd(q, k, v, scale):
    return grouped_plain_attention(q, k, v, scale=scale), (q, k, v)


def _grouped_plain_bwd(scale, res, g):
    # recompute-forward through the XLA path (identical math)
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: xla_attention(q_, k_, v_, causal=False,
                                         scale=scale), q, k, v)
    return vjp(g)


_grouped_plain_with_vjp.defvjp(_grouped_plain_fwd, _grouped_plain_bwd)


def _grouped_plain_ok(q, k) -> bool:
    """VMEM-conservative eligibility for the grouped plain kernel."""
    b, s, h, d = q.shape
    s_pad = s + (-s) % 8
    return (k.shape[1] == s and d % 8 == 0
            # logits + p (f32) plus 4 blocks at group>=1 within ~12 MB
            and 12 * s_pad * s_pad + 8 * 2 * s_pad * d <= 12 * 2 ** 20)


def multi_head_attention(q, k, v, *, causal: bool = False,
                         bias: Optional[jax.Array] = None,
                         mask: Optional[jax.Array] = None,
                         scale: Optional[float] = None,
                         impl: str = "auto") -> jax.Array:
    """Dispatching attention entry point. Shapes (B, S, H, D)."""
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        simple = bias is None and mask is None
        big = q.shape[1] >= 128 and q.shape[-1] % 128 == 0
        if (on_tpu and simple and not causal and q.shape[1] >= 128
                and _grouped_plain_ok(q, k)):
            # ragged/short-head self-attention (CLIP's S=577, D=64): the
            # grouped kernel keeps logits in VMEM where the XLA path
            # streams (B, H, S, S) f32 through HBM
            impl = "grouped"
        else:
            impl = "pallas" if (on_tpu and simple and big) else "xla"
    if impl == "grouped":
        s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
        return _grouped_plain_with_vjp(q, k, v, s)
    if impl == "pallas":
        block = _block_for(q.shape[1])
        if block is not None and q.shape[1] == k.shape[1]:
            # fully-fused path: flash forward + flash backward kernels
            from .flash_backward import flash_attention_trainable
            s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
            return flash_attention_trainable(q, k, v, causal, s, block)
        return _flash_with_vjp(q, k, v, causal, scale)
    return xla_attention(q, k, v, causal=causal, bias=bias, mask=mask,
                         scale=scale)
