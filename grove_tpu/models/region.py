"""Region encoder: multi-level ROI queries for `<bbox>` prompting.

Rebuild of `model/layers.py:96-341` (MLVLFuseModule + MlvlRoIExtractor +
MLVLROIQueryModule): CLIP hidden-state levels are upsampled into a pyramid,
coord-conv'ed, fused by 5 rounds of channel-shuffled GN convs, ROI-aligned at
14x14 per level, fused, flattened to a 1024-d query plus a sine-free MLP box
positional embedding, then projected to the LM width (4096).

Static-shape contract: boxes arrive as (B, R, 4) normalized xyxy plus an
(B, R) mask; padded rois produce garbage queries that the caller masks out
of the embedding splice.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roi_align import roi_align


def _bilinear_resize(x, size):
    """NHWC align_corners=True bilinear (torch F.interpolate semantics)."""
    b, h, w, c = x.shape
    th, tw = size
    if h == th and w == tw:
        return x
    ys = jnp.linspace(0.0, h - 1.0, th)
    xs = jnp.linspace(0.0, w - 1.0, tw)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (ys - y0)[None, :, None, None]
    lx = (xs - x0)[None, None, :, None]
    v00 = x[:, y0][:, :, x0]
    v01 = x[:, y0][:, :, x1]
    v10 = x[:, y1][:, :, x0]
    v11 = x[:, y1][:, :, x1]
    return (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
            + v10 * ly * (1 - lx) + v11 * ly * lx).astype(x.dtype)


class MLVLFuseModule(nn.Module):
    """Coord-conv + channel-shuffled cross-level fusion
    (`model/layers.py:96-196`)."""
    embed_dims: int = 1024
    num_levels: int = 4
    num_fuse: int = 5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        # coord features in [-1, 1] (layers.py:117-127)
        withcoord = []
        for f in feats:
            b, h, w, c = f.shape
            ys = jnp.linspace(-1, 1, h)
            xs = jnp.linspace(-1, 1, w)
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            coord = jnp.stack([xx, yy], -1)[None]
            coord = jnp.broadcast_to(coord, (b, h, w, 2)).astype(f.dtype)
            withcoord.append(jnp.concatenate([f, coord], -1))
        feats = [nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype,
                         name=f"input_conv_{i}")(f)
                 for i, f in enumerate(withcoord)]

        shuffle = self.embed_dims // 4
        remain = self.embed_dims - 2 * shuffle
        nl = self.num_levels
        fuse_lvls = [(l, min(l + 1, nl - 1), max(l - 1, 0))
                     for l in range(nl)]

        for fi in range(self.num_fuse):
            conv = nn.Conv(self.embed_dims, (3, 3), padding="SAME",
                           use_bias=False, dtype=self.dtype,
                           name=f"fuse_conv_{fi}")
            gn = nn.GroupNorm(num_groups=min(64, self.embed_dims),
                              dtype=self.dtype, name=f"fuse_gn_{fi}")
            fused = []
            for tar, top, dow in fuse_lvls:
                t = feats[tar]
                size = t.shape[1:3]
                from_top = _bilinear_resize(
                    feats[top][..., remain + shuffle:], size)
                from_down = _bilinear_resize(
                    feats[dow][..., remain:remain + shuffle], size)
                fused.append(jnp.concatenate(
                    [t[..., :remain], from_top, from_down], -1))
            feats = [nn.relu(gn(conv(f))) for f in fused]
        return feats


class MlvlRoIExtractor(nn.Module):
    """Per-level 14x14 RoIAlign + fuse convs + query projection
    (`model/layers.py:245-341`)."""
    embed_dims: int = 1024
    out_dims: int = 4096
    num_levels: int = 4
    output_size: int = 14
    sampling_ratio: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], rois_norm: jax.Array,
                 roi_batch_idx: jax.Array) -> jax.Array:
        """feats: list of (B, H_l, W_l, C); rois_norm: (N, 4) in [0, 1];
        roi_batch_idx: (N,). Returns (N, out_dims) queries."""
        # reference scales normalized rois by 224 and uses
        # featmap_strides = [14/8, 14/4, 14/2, 14] (layers.py:211,299)
        strides = [14 / (2 ** (self.num_levels - 1 - i))
                   for i in range(self.num_levels)]
        rois_img = rois_norm.astype(jnp.float32) * 224.0
        rois5 = jnp.concatenate(
            [roi_batch_idx[:, None].astype(jnp.float32), rois_img], axis=1)

        # NOTE: the positional MLP consumes the *normalized* rois — only the
        # roi-align coordinates are scaled by 224 (`layers.py:295-299`)
        pos = nn.Dense(256, dtype=self.dtype, name="pos_embedd_0")(
            rois_norm.astype(self.dtype))
        pos = nn.relu(pos)
        pos = nn.LayerNorm(dtype=self.dtype, name="pos_embedd_2")(pos)
        pos = nn.Dense(1024, dtype=self.dtype, name="pos_embedd_3")(pos)
        pos = nn.relu(pos)
        pos = nn.LayerNorm(dtype=self.dtype, name="pos_embedd_5")(pos)

        fused = 0.0
        for i in range(self.num_levels):
            rf = roi_align(feats[i].astype(jnp.float32), rois5,
                           self.output_size, 1.0 / strides[i],
                           self.sampling_ratio)
            rf = rf.astype(self.dtype)
            fused = fused + nn.Conv(self.embed_dims, (3, 3), padding="SAME",
                                    dtype=self.dtype,
                                    name=f"pconvs_{i}")(rf)
        fused = nn.relu(fused)
        n = fused.shape[0]
        flat = fused.reshape(n, -1)
        q = nn.Dense(1024, dtype=self.dtype, name="flatten_linear")(flat)
        q = q + pos
        return nn.Dense(self.out_dims, dtype=self.dtype, name="updims")(q)


class MLVLROIQueryModule(nn.Module):
    """Top module (`model/layers.py:199-243`): pyramid upsample -> fuse ->
    ROI extract."""
    embed_dims: int = 1024
    out_dims: int = 4096
    num_levels: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, mlvl_feats: Sequence[jax.Array], rois_norm, batch_idx):
        """mlvl_feats: tuple of (B, P, C) patch tokens (shallow->deep)."""
        import math
        feats = []
        for f in mlvl_feats:
            b, p, c = f.shape
            g = int(math.isqrt(p))
            feats.append(f.reshape(b, g, g, c))
        base = feats[0].shape[1:3]
        nl = len(feats)
        to_shape = [(base[0] * 2 ** l, base[1] * 2 ** l) for l in range(nl)]
        to_shape = to_shape[::-1]
        feats = [
            _bilinear_resize(f.astype(jnp.float32), s).astype(self.dtype)
            for f, s in zip(feats, to_shape)]
        feats = MLVLFuseModule(self.embed_dims, nl, dtype=self.dtype,
                               name="mlvl_fuse")(feats)
        return MlvlRoIExtractor(self.embed_dims, self.out_dims, nl,
                                dtype=self.dtype,
                                name="roi_align")(feats, rois_norm,
                                                  batch_idx)
