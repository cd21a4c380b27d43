"""Video-token pooling strategies (reference `pooling.py:6-82`).

GROVE uses `spatiotemporal` (AdaptiveAvgPool3d -> 576 tokens); the other
variants ship in the reference as selectable alternatives and are kept here
as framework capabilities. All take (B, T, H, W, C) patch grids and return
(B, N, C) token sequences.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.layers import adaptive_avg_pool_3d


def spatiotemporal_pool(x, out_thw: Tuple[int, int, int] = (8, 8, 9)):
    """AdaptiveAvgPool3d over (t, h, w) -> (B, t'*h'*w', C)."""
    b = x.shape[0]
    pooled = adaptive_avg_pool_3d(x, out_thw, axes=(1, 2, 3))
    t, h, w = out_thw
    return pooled.reshape(b, t * h * w, x.shape[-1])


def spatial_pool_per_frame(x, tokens_per_frame: int = 64):
    """AdaptiveAvgPool2d per frame (`pooling.py:28-48`)."""
    b, t, hh, ww, c = x.shape
    side = int(tokens_per_frame ** 0.5)
    pooled = adaptive_avg_pool_3d(x, (t, side, side), axes=(1, 2, 3))
    return pooled.reshape(b, t * side * side, c)


def temporal_mean_pool(x):
    """Average across frames (`pooling.py:51-65`)."""
    b, t, hh, ww, c = x.shape
    return x.mean(axis=1).reshape(b, hh * ww, c)
