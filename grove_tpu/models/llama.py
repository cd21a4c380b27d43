"""LLaMA-style decoder in flax with functional KV cache.

Checkpoint-parity notes (HF `LlamaForCausalLM`, used by the reference via
`model/llava/model/language_model/llava_llama.py:26-142`):
  * RoPE uses the HF half-rotation convention (rotate_half with d/2 split);
  * hidden states consumed downstream ([DET] gathering,
    `model/GROVE.py:248-268`) are AFTER the final RMSNorm — both in training
    (last element of the hidden-states tuple) and generation (per-step
    last-layer tensor);
  * the model consumes `inputs_embeds` directly: the multimodal video splice
    happens outside (grove_tpu.models.grove).

The KV cache is a plain pytree {"k", "v"} of (B, C, H, D) buffers passed in
and returned, so greedy decode runs as a `lax` loop without flax mutable
collections.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import LlamaConfig
from ..ops.attention import (multi_head_attention, prefill_attention_ok,
                             prefill_attention_raw,
                             prefill_attention_trainable, xla_attention)
from .layers import Int4Dense, Int8Dense, RMSNorm


def _fused_ln_interpret() -> bool:
    """Test/debug knob: run the fused-LN kernel in interpret mode off-TPU.

    Read at TRACE time — flipping the env var after a jitted apply has
    cached its trace has no effect until the next retrace (each distinct
    shape/config retraces, which is why the CPU parity test works)."""
    return os.environ.get("GROVE_FUSED_LN_INTERPRET") == "1"


def _dense(cfg: LlamaConfig, features: int, dtype, name: str,
           bits: int = 0):
    """Dense factory: bf16 kernel, or int8 + per-channel scale when
    `cfg.weight_quant` (serving mode; params produced by
    `ops.quant.quantize_llama_tree`). With `cfg.act_quant` on top,
    activations are dynamically int8-quantized per token too (W8A8):
    prefill is compute-bound and int8 MXU dots run 2x bf16; decode is
    HBM-bound on the (already int8) weights either way.

    `cfg.weight_quant_bits == 4` swaps the projection kernels for
    group-wise `Int4Dense` (params from `quantize_llama_tree_int4`);
    callers pin `bits=8` for matrices that stay int8 (lm_head)."""
    if cfg.weight_quant:
        if (bits or cfg.weight_quant_bits) == 4:
            return Int4Dense(features, group=cfg.quant_group, dtype=dtype,
                             act_quant=cfg.act_quant, name=name)
        return Int8Dense(features, dtype=dtype, act_quant=cfg.act_quant,
                         name=name)
    return nn.Dense(features, use_bias=False, dtype=dtype, name=name)


def rope_angles(positions: jax.Array, head_dim: int,
                theta: float) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for HF-convention RoPE. positions: (B, S) or (S,)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., S, D/2)
    ang = jnp.concatenate([ang, ang], axis=-1)                  # (..., S, D)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, H, D); cos/sin: (B, S, D) or (S, D)."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
            ).astype(x.dtype)


def _quantize_kv(x: jax.Array):
    """Per-token-per-head absmax int8 quantization of a (B, S, H, D) K or V
    slab. Returns (int8 values, bf16 scales broadcastable on D)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


class LoraDelta(nn.Module):
    """Zero-init LoRA adapter: x @ A^T @ B^T * (alpha / r)."""
    features: int
    r: int
    alpha: float
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(self.r, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.01),
                     name="lora_A")(x)
        b = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="lora_B")(a)
        return b * (self.alpha / self.r)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, cache_offset=None,
                 attn_mask=None, pad_lens=None, sx=None):
        """pad_lens (B,): number of LEFT-pad positions per sample; padded
        cache slots are masked out of every query's attention (enables
        batched generation over unequal-length prompts).

        `sx` given means `x` arrived per-token int8 from a fused
        add+RMSNorm+quant producer (x ~= x_int8 * sx); the Int4Dense
        projections consume the pair directly (see Int4Dense.__call__)."""
        cfg = self.cfg
        b, s, _ = x.shape
        hd = cfg.head_dim
        nq, nkv = cfg.num_heads * hd, cfg.num_kv_heads * hd
        # The fused-LN int8 carry is only valid when every consumer here
        # understands the (q8, sx) pair: LoRA deltas read bf16 activations
        # and non-Int4Dense kernels take plain x. Guard locally instead of
        # relying on the model-level fuse_ln gate alone (ADVICE r3).
        assert sx is None or (cfg.lora_r == 0
                              and cfg.weight_quant_bits == 4), (
            "fused-LN int8 carry reached an attention config that can't "
            "consume it (lora_r>0 or non-int4 projections)")

        def proj(features, name):
            d = _dense(cfg, features, self.dtype, name)
            if isinstance(d, Int4Dense):
                return d(x, sx)
            assert sx is None, "int8 carry fed to a non-Int4Dense kernel"
            return d(x)

        if cfg.fused_qkv:
            # one wide matmul; columns are independent dot products, so
            # splitting afterwards is bit-identical to three matmuls
            qkv = proj(nq + 2 * nkv, "qkv_proj")
            q = qkv[..., :nq]
            k = qkv[..., nq:nq + nkv]
            v = qkv[..., nq + nkv:]
        else:
            q = proj(nq, "q_proj")
            k = proj(nkv, "k_proj")
            v = proj(nkv, "v_proj")
        if cfg.lora_r > 0:
            # reference LoRA targets q_proj/v_proj (`train.py:52`)
            q = q + LoraDelta(cfg.num_heads * hd, cfg.lora_r, cfg.lora_alpha,
                              dtype=self.dtype, name="q_proj_lora")(x)
            v = v + LoraDelta(cfg.num_kv_heads * hd, cfg.lora_r,
                              cfg.lora_alpha, dtype=self.dtype,
                              name="v_proj_lora")(x)
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_kv_heads, hd)
        v = v.reshape(b, s, cfg.num_kv_heads, hd)

        cos, sin = rope_angles(positions, hd, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = None
        use_raw = (jax.default_backend() == "tpu"
                   and cfg.num_kv_heads == cfg.num_heads
                   and prefill_attention_ok(
                       (b, s, cfg.num_heads * hd), cfg.num_heads))
        if kv_cache is None:
            # pure self-attention (training / teacher-forced inference)
            if cfg.num_kv_heads != cfg.num_heads:
                reps = cfg.num_heads // cfg.num_kv_heads
                k = jnp.repeat(k, reps, axis=2)
                v = jnp.repeat(v, reps, axis=2)
            from ..ops.attention import _block_for
            if use_raw and attn_mask is None and _block_for(s) is None:
                # ragged S (e.g. the 624-token serving prompt): the flash
                # path would pad to the next 512-block (624 -> 1024) and
                # fold heads through HBM transposes; the raw-layout
                # one-pass kernel does neither (its (B, S, H, D) reshapes
                # are free views). Block-aligned S (training's 640/704)
                # keeps the fused flash fwd+bwd kernels.
                out = prefill_attention_trainable(
                    q.reshape(b, s, -1), k.reshape(b, s, -1),
                    v.reshape(b, s, -1), cfg.num_heads,
                    1.0 / (hd ** 0.5)).reshape(b, s, cfg.num_heads, hd)
            else:
                out = multi_head_attention(q, k, v, causal=True,
                                           mask=attn_mask)
        elif "k_s" in kv_cache:
            # int8 KV cache, row-major (B, Hkv, C, D) layout with
            # per-token-per-head absmax scales. Decode (s == 1) runs the
            # fused Pallas kernel that dequantizes in VMEM after int8 HBM
            # reads (ops/decode_attention.py); prefill (s > 1) attends
            # over the fresh-precision k/v directly — valid because GROVE
            # prefill always starts from an empty cache — while writing
            # the quantized slabs for the decode steps that follow.
            from ..ops.decode_attention import (NEG_INF,
                                                int8_cache_decode_attention)
            qk, ks = _quantize_kv(k)
            qv, vs_ = _quantize_kv(v)
            # C sits on SUBLANES so this append updates in place; a
            # lane-offset DUS (old (B,Hkv,D,C) layout) copies the whole
            # 50 MB slab per step (profiled: 11 ms of a b16 decode step)
            ck = jax.lax.dynamic_update_slice(
                kv_cache["k"], qk.transpose(0, 2, 1, 3),
                (0, 0, cache_offset, 0))
            cv = jax.lax.dynamic_update_slice(
                kv_cache["v"], qv.transpose(0, 2, 1, 3),
                (0, 0, cache_offset, 0))
            cks = jax.lax.dynamic_update_slice(
                kv_cache["k_s"], ks[..., 0].transpose(0, 2, 1),
                (0, 0, cache_offset))
            cvs = jax.lax.dynamic_update_slice(
                kv_cache["v_s"], vs_[..., 0].transpose(0, 2, 1),
                (0, 0, cache_offset))
            new_cache = {"k": ck, "v": cv, "k_s": cks, "v_s": cvs}
            if s == 1:
                cpad = ck.shape[2]     # (B, Hkv, C, D)
                kpos = jnp.arange(cpad)[None, :]
                valid = kpos <= cache_offset
                if pad_lens is not None:
                    valid = valid & ((kpos >= pad_lens[:, None])
                                     | (kpos == cache_offset))
                # kernel wants a per-sample (B, C) bias; without pad_lens
                # the mask is sample-independent (1, C) — broadcast it
                valid = jnp.broadcast_to(valid, (b, cpad))
                bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
                out = int8_cache_decode_attention(q[:, 0], ck, cv, cks,
                                                  cvs, bias)
                out = out[:, None]                       # (B, 1, H, D)
            else:
                kk, vv = k, v
                if cfg.num_kv_heads != cfg.num_heads:
                    reps = cfg.num_heads // cfg.num_kv_heads
                    kk = jnp.repeat(kk, reps, axis=2)
                    vv = jnp.repeat(vv, reps, axis=2)
                if use_raw:
                    # serving prefill: fused causal+left-pad masking in
                    # the raw-layout kernel — the old xla path streamed
                    # the (B, H, S, S) f32 logits through HBM
                    pad_eff = (pad_lens - cache_offset
                               if pad_lens is not None
                               else jnp.zeros((b,), jnp.int32))
                    out = prefill_attention_raw(
                        q.reshape(b, s, -1),
                        kk.astype(q.dtype).reshape(b, s, -1),
                        vv.astype(q.dtype).reshape(b, s, -1),
                        pad_eff, cfg.num_heads,
                        1.0 / (hd ** 0.5)).reshape(b, s,
                                                   cfg.num_heads, hd)
                else:
                    kidx = jnp.arange(s)[None, None, None, :]
                    qidx = jnp.arange(s)[None, None, :, None]
                    mask = kidx <= qidx
                    if pad_lens is not None:
                        kabs = cache_offset + kidx
                        mask = mask & ((kabs
                                        >= pad_lens[:, None, None, None])
                                       | (kidx == qidx))
                    out = xla_attention(q, kk.astype(q.dtype),
                                        vv.astype(q.dtype), mask=mask)
        else:
            # write into the cache at cache_offset, attend over the prefix
            ck = jax.lax.dynamic_update_slice(
                kv_cache["k"], k.astype(kv_cache["k"].dtype),
                (0, cache_offset, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                kv_cache["v"], v.astype(kv_cache["v"].dtype),
                (0, cache_offset, 0, 0))
            new_cache = {"k": ck, "v": cv}
            kk, vv = ck, cv
            if cfg.num_kv_heads != cfg.num_heads:
                reps = cfg.num_heads // cfg.num_kv_heads
                kk = jnp.repeat(kk, reps, axis=2)
                vv = jnp.repeat(vv, reps, axis=2)
            cache_len = kk.shape[1]
            kpos = jnp.arange(cache_len)[None, None, None, :]
            qpos = cache_offset + jnp.arange(s)[None, None, :, None]
            mask = kpos <= qpos  # causal over the cache
            if pad_lens is not None:
                # exclude left-pad slots, but keep self-attention for the
                # pad rows themselves: a fully-masked row softmaxes to NaN
                # and 0 * NaN poisons later layers through their k/v
                mask = mask & ((kpos >= pad_lens[:, None, None, None])
                               | (kpos == qpos))
            out = xla_attention(q, kk.astype(q.dtype), vv.astype(q.dtype),
                                mask=mask)

        out = out.reshape(b, s, cfg.num_heads * hd)
        out = _dense(cfg, cfg.hidden_size, self.dtype, "o_proj")(out)
        return out, new_cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, sx=None):
        cfg = self.cfg

        def proj(features, name):
            d = _dense(cfg, features, self.dtype, name)
            if isinstance(d, Int4Dense):
                return d(x, sx)
            assert sx is None, "int8 carry fed to a non-Int4Dense kernel"
            return d(x)

        if cfg.fused_qkv:
            gu = proj(2 * cfg.intermediate_size, "gate_up_proj")
            gate = gu[..., :cfg.intermediate_size]
            up = gu[..., cfg.intermediate_size:]
        else:
            gate = proj(cfg.intermediate_size, "gate_proj")
            up = proj(cfg.intermediate_size, "up_proj")
        h = nn.silu(gate) * up
        return _dense(cfg, cfg.hidden_size, self.dtype, "down_proj")(h)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, cache_offset=None,
                 attn_mask=None, pad_lens=None, branch=None,
                 fuse_ln=False):
        """`fuse_ln` (W4A8 serving prefill): both norm sites run the
        one-pass add+RMSNorm+dynamic-quant kernel and the block threads
        an un-added (resid, branch) carry — the residual add at every
        block boundary fuses into the NEXT norm's pass instead of
        running as its own HBM round trip (the XLA chain profiled ~119
        ms across a b16 prefill's 64 norm sites). Returns
        ((resid, branch), cache); caller adds at materialization points
        (final norm, hidden-state taps)."""
        eps = self.cfg.rms_norm_eps
        if fuse_ln:
            resid, q8, sx = RMSNorm(eps=eps, name="input_layernorm")(
                x, branch, quant_dyn=True)
            attn_out, new_cache = LlamaAttention(
                self.cfg, dtype=self.dtype, name="self_attn")(
                    q8, positions, kv_cache, cache_offset, attn_mask,
                    pad_lens, sx=sx)
            resid, q8, sx = RMSNorm(eps=eps,
                                    name="post_attention_layernorm")(
                resid, attn_out, quant_dyn=True)
            mlp_out = LlamaMLP(self.cfg, dtype=self.dtype, name="mlp")(
                q8, sx)
            return (resid, mlp_out), new_cache
        if branch is not None:
            x = x + branch
        h = RMSNorm(eps=eps, name="input_layernorm")(x)
        attn_out, new_cache = LlamaAttention(
            self.cfg, dtype=self.dtype, name="self_attn")(
                h, positions, kv_cache, cache_offset, attn_mask, pad_lens)
        x = x + attn_out
        h = RMSNorm(eps=eps, name="post_attention_layernorm")(x)
        x = x + LlamaMLP(self.cfg, dtype=self.dtype, name="mlp")(h)
        return x, new_cache


class LlamaModel(nn.Module):
    """Decoder stack over `inputs_embeds`; returns post-final-norm states.

    `act_sharding` (optional NamedSharding, e.g.
    `parallel.sharding.sequence_parallel_sharding(mesh)`) is applied to the
    residual stream between blocks on the cache-free (training) path —
    Megatron-style sequence parallelism expressed as a GSPMD constraint.
    It adds no parameters, so models with and without it share checkpoints.
    """
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    act_sharding: Optional[object] = None

    @nn.compact
    def __call__(self, inputs_embeds, positions, kv_caches=None,
                 cache_offset=None, attn_mask=None, pad_lens=None):
        cfg = self.cfg
        x = inputs_embeds.astype(self.dtype)
        b, s = x.shape[:2]
        constrain = (
            (lambda h: jax.lax.with_sharding_constraint(h,
                                                        self.act_sharding))
            if self.act_sharding is not None and kv_caches is None
            else (lambda h: h))
        x = constrain(x)
        new_caches = [] if kv_caches is not None else None
        # Fused add+RMSNorm+dynamic-quant carry: W4A8 serving multi-token
        # shapes only (the kernel has no VJP; LoRA reads the bf16 normed
        # activations; decode rows stay bf16 — see Int4Dense dispatch).
        # Gate mirrors Int4Dense's on_tpu dispatch (group and feature
        # widths % 128) so the carry only engages when the int8-dot path
        # will actually consume it (ADVICE r3); `_fused_ln_interpret()`
        # is read at TRACE time — a cached jit won't see later env flips.
        fuse_ln = ((jax.default_backend() == "tpu"
                    or _fused_ln_interpret())
                   and cfg.weight_quant and cfg.weight_quant_bits == 4
                   and cfg.act_quant and cfg.lora_r == 0
                   and s > 1 and b * s >= 64
                   and cfg.hidden_size % 128 == 0
                   and cfg.quant_group % 128 == 0
                   and cfg.intermediate_size % 128 == 0
                   and (cfg.num_heads * cfg.head_dim) % 128 == 0
                   and (cfg.num_kv_heads * cfg.head_dim) % 128 == 0
                   and self.act_sharding is None
                   and not (self.remat and kv_caches is None))
        block_cls = LlamaBlock
        if self.remat and kv_caches is None:
            block_cls = nn.remat(LlamaBlock, prevent_cse=False)
        branch = None
        for i in range(self.cfg.num_layers):
            cache_i = kv_caches[i] if kv_caches is not None else None
            block = block_cls(self.cfg, dtype=self.dtype,
                              name=f"layers_{i}")
            if fuse_ln:
                (x, branch), nc = block(x, positions, cache_i,
                                        cache_offset, attn_mask, pad_lens,
                                        branch=branch, fuse_ln=True)
            else:
                # remat path keeps the original signature (a bool kwarg
                # would be traced by jax.checkpoint into a tracer)
                x, nc = block(x, positions, cache_i, cache_offset,
                              attn_mask, pad_lens)
                x = constrain(x)
            if new_caches is not None:
                new_caches.append(nc)
        x = RMSNorm(eps=self.cfg.rms_norm_eps, name="norm")(x, branch)
        return x, new_caches


class LlamaEmbed(nn.Module):
    """Token embedding table (kept separate so the video splice can inject
    features between lookup and the decoder stack)."""
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids):
        emb = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.cfg.padded_vocab_size, self.cfg.hidden_size), jnp.float32)
        return emb[input_ids].astype(self.dtype)


class LlamaLMHead(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden):
        return _dense(self.cfg, self.cfg.padded_vocab_size, self.dtype,
                      "lm_head", bits=8)(hidden)


def init_kv_caches(cfg: LlamaConfig, batch: int, max_len: int,
                   dtype=jnp.bfloat16):
    """Allocate empty per-layer KV cache buffers.

    `dtype=jnp.int8` allocates a quantized cache (int8 values + bf16
    per-token-per-head scales) at ~half the HBM of bf16 — an opt-in for
    memory-constrained serving (decode speed is ~0.9x on this hardware;
    see ops/decode_attention.py). Quant/dequant happens inside
    `LlamaAttention` (`_quantize_kv` + the fused decode kernel)."""
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if dtype == jnp.int8:
        # row-major layout (B, Hkv, Cpad, D): D fills the vector lanes,
        # C (the growing axis) sits on sublanes so per-step appends are
        # in-place; padded to the 128 tile (scales keep C on lanes),
        # masked by bias
        cpad = -(-max_len // 128) * 128
        kshape = (batch, cfg.num_kv_heads, cpad, cfg.head_dim)
        sshape = (batch, cfg.num_kv_heads, cpad)
        return [
            {"k": jnp.zeros(kshape, jnp.int8),
             "v": jnp.zeros(kshape, jnp.int8),
             "k_s": jnp.zeros(sshape, jnp.bfloat16),
             "v_s": jnp.zeros(sshape, jnp.bfloat16)}
            for _ in range(cfg.num_layers)
        ]
    return [
        {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        for _ in range(cfg.num_layers)
    ]
