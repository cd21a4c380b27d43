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
from .layers import (Int8Dense, LayerNorm2d, LayerNormQuant, MLPBlock,
                     SpatioTemporalConvAdapter, quant_act)


def _dense(cfg: SamEncoderConfig, features: int, dtype, name: str):
    """Dense factory: bf16 kernel, or int8 weights + dynamic int8
    activations when `cfg.quant_w8a8` (serving mode; params produced by
    `ops.quant.quantize_sam_tree`)."""
    if cfg.quant_w8a8:
        return Int8Dense(features, dtype=dtype, use_bias=True,
                         act_quant=True, static_act=cfg.quant_static_act,
                         name=name)
    return nn.Dense(features, use_bias=True, dtype=dtype, name=name)


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


def _window_pad_mask(h: int, w: int, window: int) -> np.ndarray:
    """(n_windows, win*win) bool: True on rows that are zero padding after
    `window_partition` of an (h, w) grid. Static (trace-time numpy)."""
    hp, wp = h + (-h) % window, w + (-w) % window
    rr = np.arange(hp)[:, None] >= h           # (hp, 1)
    cc = np.arange(wp)[None, :] >= w           # (1, wp)
    pad = (rr | cc)                            # (hp, wp)
    pad = pad.reshape(hp // window, window, wp // window, window)
    return pad.transpose(0, 2, 1, 3).reshape(-1, window * window)


class SamAttention(nn.Module):
    """ViTDet attention over a token grid with optional rel-pos bias.

    TPU layout notes (measured in `benchmarks/sam_layout_probe.py`):
    * windowed path keeps q/k/v in the RAW (nW, S, H*D) projection layout
      and uses the lane-sliced v2 kernel, so the (B*H, S, D) head
      fold/unfold transposes never touch HBM — 17.4 ms/block vs 24.3 for
      the fold-based path at SAM-H/512 shapes;
    * qkv runs on the padded windows exactly like the reference
      (`image_encoder.py` Block.forward) — hoisting it to the unpadded
      grid saves 1.72x projection FLOPs but costs MORE in partition
      transposes (measured: hoist variants 26-27 ms vs 24.3);
    * proj runs after un-partitioning (identical per-row results, fewer
      padded rows through the matmul).
    """
    cfg: SamEncoderConfig
    input_size: int             # grid side this block attends over
    window: int = 0             # 0 => global attention over the full grid
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, sx=None):  # (B, H, W, C); int8 x + sx in W8A8
        cfg = self.cfg
        b, h, w, c = x.shape
        nh = cfg.num_heads
        hd = c // nh

        win = self.window
        if cfg.quant_w8a8 and sx is None:
            # standalone use without a fused-LN producer: quantize on
            # the unpartitioned grid (the window partition then shuffles
            # int8 bytes at half the bf16 traffic; in-window quant
            # measured SLOWER than bf16). SamBlock normally hands us the
            # already-quantized LayerNormQuant output instead.
            x, sx = quant_act(x)
        if win > 0:
            hw = (win, win)
            x, pad_hw = window_partition(x, win)      # (nW, win, win, C)
            if sx is not None and getattr(sx, "ndim", 0) > 1:
                sx, _ = window_partition(sx, win)
            nb, s = x.shape[0], win * win
        else:
            hw = (h, w)
            nb, s = b, h * w
        if sx is not None:
            sx_arg = (sx if getattr(sx, "ndim", 0) == 0
                      else sx.reshape(nb, s, 1))
            qkv = _dense(cfg, 3 * c, self.dtype, "qkv")(
                x.reshape(nb, s, c), sx_arg)
        else:
            qkv = _dense(cfg, 3 * c, self.dtype, "qkv")(x.reshape(nb, s, c))
        # the windowed kernels consume qkv UNSPLIT (v3: q/k/v sliced by
        # static lane offsets in VMEM) — jnp.split here materialized
        # three (nW, S, C) copies, ~176 ms of a b16 SAM stage
        fused_window = cfg.use_rel_pos and win > 0 and s <= 256
        if not fused_window:
            q, k, v = jnp.split(qkv, 3, axis=-1)      # (nb, s, c) raw

        # W8A8 serving with installed static scales: this module owns the
        # proj input's calibrated scale so the windowed kernel can emit
        # proj's int8 input directly (`proj_absmax` is sown on the
        # dynamic/calibration path below; `ops.quant.install_act_scales`
        # turns it into the `proj_act_scale` param read here)
        static_mode = cfg.quant_w8a8 and cfg.quant_static_act
        static_ready = (static_mode
                        and not self.is_mutable_collection("act_stats"))
        # declared whenever static mode is on (NOT gated on static_ready:
        # init makes every collection mutable, so gating on the
        # calibration check would skip creation at init and the serving
        # apply would then miss the param — LayerNormQuant precedent)
        pscale = (self.param("proj_act_scale", nn.initializers.ones,
                             (), jnp.float32) if static_mode else None)
        out_q8 = None   # int8 proj input straight from the kernel
        if cfg.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size - 1, hd), jnp.float32)
            # bias is computed from the UNSCALED q and added after the
            # q@k scaling (`image_encoder.py:310-315`); the fused kernels
            # stream the decomposed bias instead of materializing S x S
            if fused_window and static_ready:
                from ..ops.sam_attention import (
                    sam_window_attention_fused_q8)
                out_q8 = sam_window_attention_fused_q8(
                    qkv, rel_h, rel_w, hw, nh, pscale)        # int8
                out = out_q8
            elif fused_window:
                from ..ops.sam_attention import sam_window_attention_fused
                out = sam_window_attention_fused(qkv, rel_h, rel_w,
                                                 hw, nh)      # (nb, s, c)
            else:
                from ..ops.sam_attention import sam_attention_with_relpos
                out = sam_attention_with_relpos(
                    q.reshape(nb, s, nh, hd), k.reshape(nb, s, nh, hd),
                    v.reshape(nb, s, nh, hd), rel_h, rel_w, hw)
                out = out.reshape(nb, s, c)
        else:
            out = multi_head_attention(
                q.reshape(nb, s, nh, hd), k.reshape(nb, s, nh, hd),
                v.reshape(nb, s, nh, hd), impl="xla")
            out = out.reshape(nb, s, c)

        if win > 0:
            out = window_unpartition(out.reshape(nb, win, win, c),
                                     win, pad_hw, (h, w))
        else:
            out = out.reshape(b, h, w, c)
        out = out.reshape(b, h * w, c)
        proj = _dense(cfg, c, self.dtype, "proj")
        if not cfg.quant_w8a8:
            return proj(out).reshape(b, h, w, c)
        if out_q8 is not None:
            # kernel already quantized with the static proj scale; the
            # unpartition above moved int8 bytes (half the bf16 traffic)
            out = proj(out, pscale)
        elif static_ready:
            # global blocks / fallback shapes: one fused elementwise
            # quantize with the same static scale
            from .layers import quant_act_static
            xq, _ = quant_act_static(out, pscale)
            out = proj(xq, pscale)
        else:
            # dynamic serving + the calibration pass: per-token quant
            # here (this module owns the stat) so proj never re-quantizes
            from .layers import _sow_absmax as _sow
            _sow(self, "proj_absmax", out)
            xq, sxd = quant_act(out)
            out = proj(xq, sxd)
        return out.reshape(b, h, w, c)


class SamBlock(nn.Module):
    cfg: SamEncoderConfig
    window_size: int            # 0 => global attention
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, branch=None):  # (B, H, W, C)
        """Quant mode threads an UNADDED (x, branch) residual carry:
        callers pass the previous block's pending MLP branch and receive
        (resid, mlp_branch) back, so every residual add fuses into a
        norm site's one-pass add+LN+quant kernel instead of
        materializing between blocks (see `ops.fused_ln`). bf16 mode
        keeps the reference dataflow (`image_encoder.py` Block.forward).
        """
        cfg = self.cfg
        attn = SamAttention(cfg,
                            input_size=(self.window_size or cfg.grid),
                            window=self.window_size,
                            dtype=self.dtype, name="attn")
        mlp = MLPBlock(int(cfg.embed_dim * cfg.mlp_ratio),
                       dtype=self.dtype, quant_w8a8=cfg.quant_w8a8,
                       static_act=cfg.quant_static_act, name="mlp")
        if cfg.quant_w8a8:
            # norms emit their output already int8 (one fused
            # add+LN+quant pass in static mode — see LayerNormQuant);
            # the residual stream stays in the compute dtype
            norm1 = LayerNormQuant(eps=cfg.layer_norm_eps,
                                   static_act=cfg.quant_static_act,
                                   use_kernel=cfg.quant_ln_kernel,
                                   name="norm1")
            if branch is None:
                xq, sx = norm1(x)
            else:
                x, xq, sx = norm1(x, branch)
            x, hq, s2 = LayerNormQuant(eps=cfg.layer_norm_eps,
                                       static_act=cfg.quant_static_act,
                                       use_kernel=cfg.quant_ln_kernel,
                                       name="norm2")(x, attn(xq, sx))
            return x, mlp(hq, s2)
        shortcut = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        x = shortcut + attn(x)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        return x + mlp(h)


class _PatchEmbed(nn.Module):
    """Non-overlapping patchify as contiguous reshapes + one einsum.

    Numerically the stride=kernel `nn.Conv` the reference uses
    (`image_encoder.py` PatchEmbed), but expressed without ever
    transposing the 3-wide channel lane dim: the input reshapes (no data
    movement) to (B, gh, p, gw, p*cin) and the kernel-row axis is
    contracted by the einsum — XLA lowers it to p accumulated
    (M, p*cin) x (p*cin, C) dots on the MXU. The direct NHWC conv
    lowering spends 19.5 ms at SAM-H/512x32-frame shapes for ~0.3 ms of
    FLOPs; this form measures 6.7 ms (benchmarks/sam_layout_probe.py).
    Param tree matches nn.Conv ({kernel: (p, p, in, out), bias}), so
    checkpoints convert unchanged.
    """
    features: int
    patch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) with H, W multiples of patch
        b, hh, ww, cin = x.shape
        p = self.patch
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        gh, gw = hh // p, ww // p
        x = x.reshape(b, gh, p, gw, p * cin)     # (b, gh, dh, gw, dw*cin)
        out = jnp.einsum("bgdwk,dkc->bgwc", x,
                         kernel.reshape(p, p * cin, self.features))
        return out + bias


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
        x = _PatchEmbed(cfg.embed_dim, cfg.patch_size,
                        dtype=self.dtype, name="patch_embed")(x)  # (B*T,g,g,C)

        pos = self.param("pos_embed", nn.initializers.zeros,
                         (cfg.grid, cfg.grid, cfg.embed_dim), jnp.float32)
        x = x + pos.astype(self.dtype)[None]

        n_adapter = 0
        block_cls = (nn.remat(SamBlock, prevent_cse=False)
                     if self.remat else SamBlock)
        branch = None   # quant mode: pending un-added MLP branch
        for i in range(cfg.depth):
            is_global = i in cfg.global_attn_indexes
            blk = block_cls(cfg,
                            window_size=0 if is_global else cfg.window_size,
                            dtype=self.dtype, name=f"blocks_{i}")
            if cfg.quant_w8a8:
                x, branch = blk(x, branch)
                if is_global:      # adapter/neck need the materialized sum
                    x = x + branch
                    branch = None
            else:
                x = blk(x)
            if is_global:
                g = cfg.grid
                grid5 = x.reshape(b, t, g, g, cfg.embed_dim)
                grid5 = SpatioTemporalConvAdapter(
                    dtype=self.dtype, quant_w8a8=cfg.quant_w8a8,
                    static_act=cfg.quant_static_act,
                    name=f"adapters_{n_adapter}")(grid5)
                x = grid5.reshape(b * t, g, g, cfg.embed_dim)
                n_adapter += 1

        if branch is not None:
            x = x + branch
        # neck in fp32 (reference guards against fp16 overflow here)
        xf = x.astype(jnp.float32)
        xf = nn.Conv(cfg.out_chans, (1, 1), use_bias=False,
                     dtype=jnp.float32, name="neck_conv1")(xf)
        xf = LayerNorm2d(name="neck_ln1")(xf)
        xf = nn.Conv(cfg.out_chans, (3, 3), padding="SAME", use_bias=False,
                     dtype=jnp.float32, name="neck_conv2")(xf)
        xf = LayerNorm2d(name="neck_ln2")(xf)
        return xf.astype(self.dtype)
