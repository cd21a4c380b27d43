"""Box coordinate math in pure jax (usable under jit and on numpy inputs).

Semantics match the reference helpers (`utils/bbox_utils.py:4-80`) and
torchvision's `generalized_box_iou_loss` (`model/GROVE.py:361`), but written
vectorized / functional. All functions accept arrays whose last dimension is 4.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(boxes):
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(boxes):
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def normalize_boxes(boxes, img_w, img_h):
    """Divide x-coords by img_w and y-coords by img_h (either box format)."""
    scale = jnp.stack([jnp.asarray(img_w, jnp.float32),
                       jnp.asarray(img_h, jnp.float32),
                       jnp.asarray(img_w, jnp.float32),
                       jnp.asarray(img_h, jnp.float32)], axis=-1)
    return boxes / scale


def unnormalize_boxes(boxes, img_w, img_h):
    """Multiply x-coords by img_w and y-coords by img_h (either box format)."""
    scale = jnp.stack([jnp.asarray(img_w, jnp.float32),
                       jnp.asarray(img_h, jnp.float32),
                       jnp.asarray(img_w, jnp.float32),
                       jnp.asarray(img_h, jnp.float32)], axis=-1)
    return boxes * scale


def box_area(boxes_xyxy):
    x1, y1, x2, y2 = jnp.split(boxes_xyxy, 4, axis=-1)
    return ((x2 - x1) * (y2 - y1))[..., 0]


def box_iou_pairwise(boxes1_xyxy, boxes2_xyxy, eps: float = 1e-7):
    """Elementwise IoU of aligned box arrays (same leading shape)."""
    lt = jnp.maximum(boxes1_xyxy[..., :2], boxes2_xyxy[..., :2])
    rb = jnp.minimum(boxes1_xyxy[..., 2:], boxes2_xyxy[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1_xyxy) + box_area(boxes2_xyxy) - inter
    return inter / (union + eps)


def box_iou_matrix(boxes1_xyxy, boxes2_xyxy, eps: float = 1e-7):
    """All-pairs IoU: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    a = boxes1_xyxy[..., :, None, :]
    b = boxes2_xyxy[..., None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = (box_area(boxes1_xyxy)[..., :, None]
             + box_area(boxes2_xyxy)[..., None, :] - inter)
    return inter / (union + eps)


def generalized_box_iou(boxes1_xyxy, boxes2_xyxy, eps: float = 1e-7):
    """Elementwise GIoU of aligned (degenerate-safe) xyxy boxes.

    Follows torchvision `generalized_box_iou_loss` internals:
    GIoU = IoU - (area(C) - union) / area(C) with C the smallest enclosing box.
    """
    iou = box_iou_pairwise(boxes1_xyxy, boxes2_xyxy, eps)
    lt = jnp.minimum(boxes1_xyxy[..., :2], boxes2_xyxy[..., :2])
    rb = jnp.maximum(boxes1_xyxy[..., 2:], boxes2_xyxy[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    enclose = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(boxes1_xyxy[..., :2], boxes2_xyxy[..., :2])
    inter_rb = jnp.minimum(boxes1_xyxy[..., 2:], boxes2_xyxy[..., 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(boxes1_xyxy) + box_area(boxes2_xyxy) - inter
    return iou - (enclose - union) / (enclose + eps)


def generalized_box_iou_loss(boxes1_xyxy, boxes2_xyxy, eps: float = 1e-7):
    """Elementwise GIoU loss = 1 - GIoU (reduction handled by the caller)."""
    return 1.0 - generalized_box_iou(boxes1_xyxy, boxes2_xyxy, eps)
