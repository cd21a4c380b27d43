"""SAM ViTDet-style grounding image encoder, TPU-native.

Re-design of `model/SAM/modeling/image_encoder.py` (ViT-H: windowed attention
with 4 global blocks, decomposed relative position bias, conv neck) plus
GROVE's video adapters (gated Conv3d after each *global-attention* block,
`image_encoder.py:139-150,179-182`).

TPU notes:
* frames fold into the batch axis (`image_encoder.py:174`), so the encoder is
  data-parallel over frames;
* window partition is pad+reshape (static shapes);
* decomposed rel-pos is an additive attention bias computed from static
  tables — gathers are precomputed numpy indexing at trace time;
* the neck runs in fp32 like the reference's overflow guard
  (`image_encoder.py:184-190`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import SamEncoderConfig
from ..ops.attention import multi_head_attention
from .layers import LayerNorm2d, MLPBlock, SpatioTemporalConvAdapter


from ..ops.sam_encoder_tables import rel_pos_index as _rel_pos_index


def decomposed_rel_pos_bias(q, rel_pos_h, rel_pos_w, hw: Tuple[int, int]):
    """Additive attention bias from decomposed rel-pos tables.

    q: (B, S, H, D) with S == h*w. Returns (B, H, S, S) bias.
    Follows `image_encoder.py:add_decomposed_rel_pos:420-458`.
    """
    h, w = hw
    b, s, nh, d = q.shape
    idx_h = _rel_pos_index(h, h)
    idx_w = _rel_pos_index(w, w)
    Rh = rel_pos_h[idx_h]          # (h, h, D)
    Rw = rel_pos_w[idx_w]          # (w, w, D)
    r_q = q.reshape(b, h, w, nh, d)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, Rw.astype(q.dtype))
    bias = rel_h[:, :, :, :, :, None] + rel_w[:, :, :, :, None, :]
    return bias.reshape(b, nh, h * w, h * w)


def window_partition(x, window: int):
    """(B, H, W, C) -> (B*nW, win, win, C) with zero padding; returns padded hw."""
    b, h, w, c = x.shape
    pad_h = (-h) % window
    pad_w = (-w) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(windows, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // ((hp * wp) // (window * window))
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SamAttention(nn.Module):
    """ViTDet attention over a token grid with optional rel-pos bias."""
    cfg: SamEncoderConfig
    input_size: int             # grid side this block attends over
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        cfg = self.cfg
        b, h, w, c = x.shape
        nh = cfg.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype,
                       name="qkv")(x.reshape(b, h * w, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, h * w, nh, hd)
        k = k.reshape(b, h * w, nh, hd)
        v = v.reshape(b, h * w, nh, hd)

        if cfg.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size - 1, hd), jnp.float32)
            # bias is computed from the UNSCALED q and added after the
            # q@k scaling (`image_encoder.py:310-315`); the fused kernel
            # streams the decomposed bias instead of materializing S x S
            from ..ops.sam_attention import sam_attention_with_relpos
            out = sam_attention_with_relpos(q, k, v, rel_h, rel_w, (h, w))
        else:
            out = multi_head_attention(q, k, v, impl="xla")
        out = out.reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SamBlock(nn.Module):
    cfg: SamEncoderConfig
    window_size: int            # 0 => global attention
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        cfg = self.cfg
        shortcut = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        if self.window_size > 0:
            hw = (x.shape[1], x.shape[2])
            x, pad_hw = window_partition(x, self.window_size)
            x = SamAttention(cfg, input_size=self.window_size,
                             dtype=self.dtype, name="attn")(x)
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        else:
            x = SamAttention(cfg, input_size=cfg.grid,
                             dtype=self.dtype, name="attn")(x)
        x = shortcut + x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        x = x + MLPBlock(int(cfg.embed_dim * cfg.mlp_ratio),
                         dtype=self.dtype, name="mlp")(h)
        return x


class SamImageEncoder(nn.Module):
    """Full grounding encoder: frames (B, T, H, W, 3) -> (B*T, g, g, out_chans).

    Output layout is NHWC; the decoder consumes it flattened.
    """
    cfg: SamEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, frames):
        cfg = self.cfg
        b, t, hh, ww, _ = frames.shape
        x = frames.reshape(b * t, hh, ww, 3).astype(self.dtype)
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)  # (B*T, g, g, C)

        pos = self.param("pos_embed", nn.initializers.zeros,
                         (cfg.grid, cfg.grid, cfg.embed_dim), jnp.float32)
        x = x + pos.astype(self.dtype)[None]

        n_adapter = 0
        block_cls = (nn.remat(SamBlock, prevent_cse=False)
                     if self.remat else SamBlock)
        for i in range(cfg.depth):
            is_global = i in cfg.global_attn_indexes
            x = block_cls(cfg,
                          window_size=0 if is_global else cfg.window_size,
                          dtype=self.dtype, name=f"blocks_{i}")(x)
            if is_global:
                g = cfg.grid
                grid5 = x.reshape(b, t, g, g, cfg.embed_dim)
                grid5 = SpatioTemporalConvAdapter(
                    dtype=self.dtype, name=f"adapters_{n_adapter}")(grid5)
                x = grid5.reshape(b * t, g, g, cfg.embed_dim)
                n_adapter += 1

        # neck in fp32 (reference guards against fp16 overflow here)
        xf = x.astype(jnp.float32)
        xf = nn.Conv(cfg.out_chans, (1, 1), use_bias=False,
                     dtype=jnp.float32, name="neck_conv1")(xf)
        xf = LayerNorm2d(name="neck_ln1")(xf)
        xf = nn.Conv(cfg.out_chans, (3, 3), padding="SAME", use_bias=False,
                     dtype=jnp.float32, name="neck_conv2")(xf)
        xf = LayerNorm2d(name="neck_ln2")(xf)
        return xf.astype(self.dtype)
