"""Static rel-pos gather tables for ViTDet attention (q_size == k_size).

Mirrors `image_encoder.py:get_rel_pos:387-417`; the gather indices are plain
numpy computed at trace time, so XLA sees constant gathers.
"""

from __future__ import annotations

import numpy as np


def rel_pos_index(q_size: int, k_size: int) -> np.ndarray:
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel.astype(np.int64)


def gather_rel_tables(rel_pos_h, rel_pos_w, h: int, w: int):
    """(L, D) tables -> Rh (h, h, D), Rw (w, w, D)."""
    return rel_pos_h[rel_pos_index(h, h)], rel_pos_w[rel_pos_index(w, w)]
