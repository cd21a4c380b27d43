"""RoIAlign in pure XLA (mmcv semantics, aligned=True).

TPU-native replacement for the mmcv CUDA RoIAlign op used by the reference
region encoder (`model/layers.py:209-217`: output 14x14, sampling_ratio 2).
Vectorized bilinear sampling: for every roi x output-cell, `sampling_ratio`^2
sample points are gathered with bilinear weights and averaged. Out-of-bounds
samples follow mmcv: points beyond [-1, size] contribute zero, in-band
points clamp to the edge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(features: jax.Array, rois: jax.Array, output_size: int,
              spatial_scale: float, sampling_ratio: int = 2,
              aligned: bool = True) -> jax.Array:
    """features: (B, H, W, C); rois: (N, 5) [batch_idx, x1, y1, x2, y2]
    in input-image coords. Returns (N, output_size, output_size, C)."""
    b, h, w, c = features.shape
    n = rois.shape[0]
    offset = 0.5 if aligned else 0.0

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset

    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    r = sampling_ratio

    # sample grid: (out, ratio) fractional offsets within the roi
    cell = jnp.arange(output_size, dtype=jnp.float32)
    sub = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r
    # (out, ratio): offset in bin units
    frac = cell[:, None] + sub[None, :]

    # sample coords: (N, out, ratio)
    ys = y1[:, None, None] + frac[None] * bin_h[:, None, None]
    xs = x1[:, None, None] + frac[None] * bin_w[:, None, None]

    def bilinear(coords_y, coords_x):
        """coords: (N, oy, ry), (N, ox, rx) -> (N, oy, ry, ox, rx, C)"""
        yy = coords_y[:, :, :, None, None]                  # (N,oy,ry,1,1)
        xx = coords_x[:, None, None, :, :]                  # (N,1,1,ox,rx)
        valid = ((yy >= -1.0) & (yy <= h) & (xx >= -1.0) & (xx <= w))
        ycl = jnp.clip(yy, 0.0, h - 1)
        xcl = jnp.clip(xx, 0.0, w - 1)
        y0 = jnp.floor(ycl).astype(jnp.int32)
        x0 = jnp.floor(xcl).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        ly = ycl - y0
        lx = xcl - x0
        hy = 1.0 - ly
        hx = 1.0 - lx

        fb = features[batch_idx]                            # (N, H, W, C)

        def gather(yi, xi):
            flat = fb.reshape(n, h * w, c)
            idx = (yi * w + xi).reshape(n, -1)
            out = jnp.take_along_axis(flat, idx[..., None], axis=1)
            return out.reshape(yi.shape + (c,))

        shape = jnp.broadcast_shapes(y0.shape, x0.shape)
        y0b = jnp.broadcast_to(y0, shape)
        x0b = jnp.broadcast_to(x0, shape)
        y1b = jnp.broadcast_to(y1i, shape)
        x1b = jnp.broadcast_to(x1i, shape)
        v00 = gather(y0b, x0b)
        v01 = gather(y0b, x1b)
        v10 = gather(y1b, x0b)
        v11 = gather(y1b, x1b)
        wy = jnp.broadcast_to(hy, shape)[..., None]
        wx = jnp.broadcast_to(hx, shape)[..., None]
        ly_b = jnp.broadcast_to(ly, shape)[..., None]
        lx_b = jnp.broadcast_to(lx, shape)[..., None]
        val = (v00 * wy * wx + v01 * wy * lx_b
               + v10 * ly_b * wx + v11 * ly_b * lx_b)
        return jnp.where(jnp.broadcast_to(valid, shape)[..., None], val, 0.0)

    samples = bilinear(ys, xs)   # (N, oy, ry, ox, rx, C)
    out = samples.mean(axis=(2, 4))            # average the r^2 samples
    return out
