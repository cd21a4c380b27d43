"""CLIP ViT vision tower with video adapters + 3-D pooling, TPU-native.

Re-design of the reference's vendored HF CLIP
(`model/llava/model/multimodal_encoder/modeling_clip.py`) restricted to the
vision path GROVE uses:

* pre-layernorm ViT (cls + patch tokens, learned position embeddings);
* a zero-init-gated Conv3d `SpatioTemporalConvAdapter` after every
  `adapter_every`-th encoder layer (idx % 3 == 0, `modeling_clip.py:705-707`),
  operating only on the patch tokens with the reference's (t=8, h=16)
  reshape quirk (`modeling_clip.py:604`);
* feature selection at hidden-states layer `select_layer` (-2), dropping the
  cls token (`clip_encoder.py:45-53`);
* AdaptiveAvgPool3d over (t, h, w) -> (pool_t, pool_h, pool_w) = 576 video
  tokens (`pooling.py:6-25`);
* frames folded into the batch axis exactly like the reference
  (`clip_encoder.py:70`), so the tower is embarrassingly data-parallel over
  frames.

The tower also returns the multi-level hidden states needed by the region
encoder (layers [-2, -5, -8, -11], `llava_with_region_arch.py:115-120`).

Like the reference (whose tower forward is wrapped in @torch.no_grad(),
`clip_encoder.py:55`), callers treat the tower output as non-differentiable;
we expose that via `stop_gradient` at the call site in grove.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ClipVisionConfig
from ..ops.attention import multi_head_attention
from .layers import Int8Dense, SpatioTemporalConvAdapter, adaptive_avg_pool_3d


def _dense(cfg: ClipVisionConfig, features: int, dtype, name: str):
    """Dense factory: bf16 kernel, or int8 weights + dynamic int8
    activations when `cfg.quant_w8a8` (serving mode; params produced by
    `ops.quant.quantize_clip_tree`)."""
    if cfg.quant_w8a8:
        return Int8Dense(features, dtype=dtype, use_bias=True,
                         act_quant=True, static_act=cfg.quant_static_act,
                         name=name)
    return nn.Dense(features, dtype=dtype, name=name)


class ClipAttention(nn.Module):
    cfg: ClipVisionConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, sx=None):  # int8 x + sx in the W8A8 path
        cfg = self.cfg
        b, s, d = x.shape
        hd = d // cfg.num_heads
        if cfg.quant_w8a8:
            # one LayerNormQuant-produced int8 input feeds all three
            # projections (previously each dense re-quantized the same
            # activations)
            q = _dense(cfg, d, self.dtype, "q_proj")(x, sx)
            k = _dense(cfg, d, self.dtype, "k_proj")(x, sx)
            v = _dense(cfg, d, self.dtype, "v_proj")(x, sx)
        else:
            q = _dense(cfg, d, self.dtype, "q_proj")(x)
            k = _dense(cfg, d, self.dtype, "k_proj")(x)
            v = _dense(cfg, d, self.dtype, "v_proj")(x)
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_heads, hd)
        v = v.reshape(b, s, cfg.num_heads, hd)
        out = multi_head_attention(q, k, v)
        out = out.reshape(b, s, d)
        return _dense(cfg, d, self.dtype, "out_proj")(out)


class ClipEncoderLayer(nn.Module):
    cfg: ClipVisionConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        attn = ClipAttention(cfg, dtype=self.dtype, name="self_attn")
        if cfg.quant_w8a8:
            from .layers import LayerNormQuant

            hq, sx = LayerNormQuant(eps=cfg.layer_norm_eps,
                                    static_act=cfg.quant_static_act,
                                    use_kernel=cfg.quant_ln_kernel,
                                    name="layer_norm1")(x)
            x = x + attn(hq, sx)
            hq, sx = LayerNormQuant(eps=cfg.layer_norm_eps,
                                    static_act=cfg.quant_static_act,
                                    use_kernel=cfg.quant_ln_kernel,
                                    name="layer_norm2")(x)
            h = _dense(cfg, cfg.intermediate_size, self.dtype,
                       "fc1")(hq, sx)
            h = h * jax.nn.sigmoid(1.702 * h)
            h = _dense(cfg, cfg.hidden_size, self.dtype, "fc2")(h)
            return x + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         dtype=self.dtype, name="layer_norm1")(x)
        x = x + attn(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         dtype=self.dtype, name="layer_norm2")(x)
        h = _dense(cfg, cfg.intermediate_size, self.dtype, "fc1")(h)
        # OpenAI CLIP uses quick_gelu: x * sigmoid(1.702 x)
        h = h * jax.nn.sigmoid(1.702 * h)
        h = _dense(cfg, cfg.hidden_size, self.dtype, "fc2")(h)
        return x + h


class ClipVideoAdapter(nn.Module):
    """Adapter wrapper handling the cls/patch split + (t, h=16) reshape."""
    cfg: ClipVisionConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: (b*t, 1+P, c)
        cfg = self.cfg
        cls_tok = x[:, :1]
        seq = x[:, 1:]
        bt, p, c = seq.shape
        t = cfg.num_frames
        b = bt // t
        h = cfg.adapter_h
        w = p // h
        grid = seq.reshape(b, t, h, w, c)
        grid = SpatioTemporalConvAdapter(dtype=self.dtype,
                                         quant_w8a8=cfg.quant_w8a8,
                                         static_act=cfg.quant_static_act,
                                         name="adapter")(grid)
        seq = grid.reshape(bt, p, c)
        return jnp.concatenate([cls_tok, seq], axis=1)


class ClipVisionTower(nn.Module):
    """Full tower: embeddings -> encoder(+adapters) -> select/pool.

    Input: frames (B, T, H, W, 3) already CLIP-preprocessed.
    Returns (video_tokens (B, N, C_hidden), mlvl_features tuple) where
    mlvl_features are the patch tokens of selected intermediate layers for
    the region encoder.
    """
    cfg: ClipVisionConfig
    dtype: jnp.dtype = jnp.bfloat16
    pool_thw: Tuple[int, int, int] = (8, 8, 9)
    num_region_levels: int = 4
    remat: bool = False

    @nn.compact
    def __call__(self, frames):
        cfg = self.cfg
        b, t, hh, ww, _ = frames.shape
        x = frames.reshape(b * t, hh, ww, 3).astype(self.dtype)

        # --- embeddings (HF CLIPVisionEmbeddings) ---
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, dtype=self.dtype,
                          name="patch_embedding")(x)
        patches = patches.reshape(b * t, cfg.num_patches, cfg.hidden_size)
        cls_emb = self.param("class_embedding",
                             nn.initializers.normal(0.02),
                             (cfg.hidden_size,), jnp.float32)
        cls_tok = jnp.broadcast_to(cls_emb.astype(self.dtype),
                                   (b * t, 1, cfg.hidden_size))
        x = jnp.concatenate([cls_tok, patches], axis=1)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.hidden_size), jnp.float32)
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x)  # HF's typo'd name, kept

        # --- encoder with adapters + hidden-state taps ---
        layer_cls = (nn.remat(ClipEncoderLayer, prevent_cse=False)
                     if self.remat else ClipEncoderLayer)
        hidden_states: List[jax.Array] = [x]
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
            if i % cfg.adapter_every == 0:
                x = ClipVideoAdapter(cfg, dtype=self.dtype,
                                     name=f"adapters_{i // cfg.adapter_every}")(x)
            hidden_states.append(x)

        # --- feature select (layer -2, patch tokens) ---
        feats = hidden_states[cfg.select_layer][:, 1:]  # (b*t, P, C)

        # --- 3-D adaptive pooling to video tokens ---
        g = cfg.grid
        vol = feats.reshape(b, t, g, g, cfg.hidden_size)
        pooled = adaptive_avg_pool_3d(vol, self.pool_thw, axes=(1, 2, 3))
        pt, ph, pw = self.pool_thw
        video_tokens = pooled.reshape(b, pt * ph * pw, cfg.hidden_size)

        # --- multi-level region features (layers -2, -5, -8, -11) ---
        sel = cfg.select_layer
        mlvl = hidden_states[sel::-cfg.adapter_every]
        mlvl = mlvl[::-1][-self.num_region_levels:]
        mlvl = tuple(h[:, 1:] for h in mlvl)

        return video_tokens, mlvl
