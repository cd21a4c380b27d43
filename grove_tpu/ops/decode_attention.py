"""Fused int8-KV-cache decode attention (Pallas, TPU).

Single-token greedy decode re-reads the whole KV cache every step (the
reference leans on flash-attn's CUDA decode path for the same reason,
`train.py:208`). This kernel attends directly over an int8 cache — stored
with per-token-per-head absmax scales in a ROW-major (B, H, C, D) layout:
D (=128) fills the TPU vector lanes and C (the growing cache-slot axis)
sits on sublanes, so the per-step cache append is a SUBLANE-offset
dynamic_update_slice that XLA updates in place. (The original
lane-transposed (B, H, D, C) layout made every append a lane-offset DUS,
which XLA:TPU rewrites as a FULL-slab copy — profiled at 0.17 ms per
50 MB slab, 11 ms of the batch-16 decode step.) The kernel dequantizes in
VMEM/registers after the int8 HBM reads:

  logits = (int8_q @ int8_K) * q_scale * k_scale + bias   # MXU int8 path
  out    = sum_c softmax(logits)[c] * v_scale[c] * V      # scales fold in

A plain XLA formulation materializes a dequantized bf16 cache copy each
step and runs 0.87x the speed of a bf16 cache; this kernel runs at ~1x
(measured: 174us/call vs XLA bf16 183us at B=32, H=12, C=768 — this
environment's DMA moves int8 at element rate, not byte rate, so halved
bytes do not halve time). The win is MEMORY: the cache shrinks ~2x (int8
slabs + bf16 scales), which at LLaMA-7B scale frees GBs of HBM for bigger
batches / longer clips. On hardware where int8 DMA runs at byte rate the
same kernel's halved reads become a near-2x decode-attention speedup.

Numerics: int8 absmax on K, V and (in-kernel) q; softmax and accumulation
in fp32/int32; tiny-model greedy ids match the fp32 cache exactly
(tested) — quantization flips tokens only at argmax near-ties.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _decode_kernel(q_ref, kt_ref, vt_ref, ks_ref, vs_ref, bias_ref, o_ref,
                   *, group: int):
    """One batch row: all query heads against the (Hkv, C, D) int8 slabs.

    Block shapes: q (1, H, 1, D); kt/vt (1, Hkv, C, D); ks/vs
    (1, Hkv, 1, C); bias (1, 1, C); out (1, H, 1, D)."""
    h, d = q_ref.shape[1], q_ref.shape[-1]
    hkv, c = kt_ref.shape[1], kt_ref.shape[2]
    # quantize q per-head (tiny, in-register) so the K contraction runs on
    # the MXU's native int8 path — no bf16 cast of the big K slab
    qf = q_ref[...].reshape(h, 1, d).astype(jnp.float32)
    qs = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0
    qs = jnp.maximum(qs, 1e-8)
    qi = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
    kt = kt_ref[...].reshape(hkv, c, d)
    if group > 1:
        kt = pltpu.repeat(kt, group, axis=0)         # tile kv heads
    # batched matvec over heads, NT form: (H,1,D) x (H,C,D) -> (H,1,C)
    logits = jax.lax.dot_general(
        qi, kt, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    logits = (logits * qs).reshape(h, c)
    ks = ks_ref[...].reshape(hkv, c).astype(jnp.float32)
    if group > 1:
        ks = pltpu.repeat(ks, group, axis=0)
    logits = logits * ks * (1.0 / math.sqrt(d))
    logits = logits + bias_ref[...].reshape(1, c).astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)       # (H, C) fp32
    vs = vs_ref[...].reshape(hkv, c).astype(jnp.float32)
    if group > 1:
        vs = pltpu.repeat(vs, group, axis=0)
    w = (w * vs).astype(jnp.bfloat16)
    vt = vt_ref[...].reshape(hkv, c, d).astype(jnp.bfloat16)
    if group > 1:
        vt = pltpu.repeat(vt, group, axis=0)
    # out[h, d] = sum_c w[h, c] * vt[h, c, d]: plain NN matvec
    out = jax.lax.dot_general(
        w.reshape(h, 1, c), vt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (H, 1, D)
    o_ref[...] = out.reshape(1, h, 1, d).astype(o_ref.dtype)


def int8_cache_decode_attention(q, kt, vt, k_s, v_s, bias, *,
                                interpret=None):
    """q: (B, H, D) current-step queries (RoPE already applied).
    kt/vt: (B, Hkv, C, D) int8 row-major cache; k_s/v_s: (B, Hkv, C)
    bf16 scales; bias: (B, C) additive fp32/bf16 mask (0 valid / -1e9).
    Returns (B, H, D) in q.dtype. C must be a multiple of 128 (the scale
    slabs keep C on lanes) and D a multiple of 128 (slab lane dim)."""
    b, h, d = q.shape
    hkv, c = kt.shape[1], kt.shape[2]
    assert c % 128 == 0, c
    group = h // hkv
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # d is the slab lane dim; blocks always span the FULL d, which the
    # TPU tile rule accepts for any size (d < 128 pads lanes — the
    # LLaMA-7B config uses exactly 128)

    # GQA: the kernel tiles kv heads with pltpu.repeat ([kv0 kv1 kv0 kv1]);
    # permute query heads to that order outside (q is tiny), invert after
    if group > 1:
        perm = [i * group + t for t in range(group) for i in range(hkv)]
        inv = [0] * h
        for j, p in enumerate(perm):
            inv[p] = j
        q = q[:, jnp.asarray(perm)]

    # singleton axes so every block's last-two dims satisfy the TPU
    # (8, 128)-divisible-or-full rule
    q4 = q.reshape(b, h, 1, d)
    ks4 = k_s.reshape(b, hkv, 1, c)
    vs4 = v_s.reshape(b, hkv, 1, c)
    bias3 = bias.reshape(b, 1, c)

    out = pl.pallas_call(
        functools.partial(_decode_kernel, group=group),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, c, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, c, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, 1, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, 1, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, 1, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        interpret=interpret,
    )(q4, kt, vt, ks4, vs4, bias3)
    out = out.reshape(b, h, d)
    if group > 1:
        out = out[:, jnp.asarray(inv)]
    return out


def decode_attention_reference(q, kt, vt, k_s, v_s, bias):
    """XLA oracle for the kernel (dequantize-then-attend)."""
    b, h, d = q.shape
    hkv = kt.shape[1]
    group = h // hkv
    kk = kt.astype(jnp.float32) * k_s[:, :, :, None].astype(jnp.float32)
    vv = vt.astype(jnp.float32) * v_s[:, :, :, None].astype(jnp.float32)
    kk = jnp.repeat(kk, group, axis=1)
    vv = jnp.repeat(vv, group, axis=1)
    logits = jnp.einsum("bhd,bhcd->bhc", q.astype(jnp.float32), kk)
    logits = logits / math.sqrt(d) + bias[:, None, :].astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhc,bhcd->bhd", w, vv)
    return out.astype(q.dtype)
