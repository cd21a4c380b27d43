"""GROVE training losses, masked/static-shape formulation.

Reference semantics: `model/GROVE.py:339-408` (`_compute_loss_components_video`)
and the shifted CE of `model/llava/model/language_model/llava_llama.py:114-125`.

The reference iterates ragged python lists (per-sample, per-frame box lists).
Here everything is a fixed-shape tensor + mask:

  pred_boxes        (B, T, P, 4)  cxcywh in [0,1]  (sigmoid box head output)
  pred_obj_logits   (B, T, P)
  gt_boxes          (B, T, P, 4)  cxcywh, zero-padded
  gt_objectness     (B, T, P)     1.0 where the phrase's object is visible
  phrase_mask       (B, P)        1.0 for real phrases of the sample

Normalization constants match the reference exactly:
  * GIoU and L1 are summed over (frame, phrase) entries that have a GT box
    (phrase valid AND objectness==1) and divided by that count (+1e-8);
  * objectness BCE is summed over all valid (frame, phrase) entries and
    divided by that count (+1e-8)  [= reference num_max_bboxes];
  * L1 is weighted by `giou_weight` — a reference quirk kept on purpose
    (`model/GROVE.py:375`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .boxes import box_cxcywh_to_xyxy, generalized_box_iou_loss


def cross_entropy_lm_loss(logits, labels, ignore_index: int = -100):
    """Shifted next-token CE, mean over non-ignored targets.

    logits: (B, L, V) float; labels: (B, L) int with ignore_index padding.
    Matches `llava_llama.py:114-125` (shift then token-mean CE).
    """
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count


def bce_with_logits(logits, targets):
    """Elementwise binary cross entropy on logits (float32 internally)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log(1+exp(-|x|)) formulation for stability
    return jnp.clip(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def grove_box_losses(
    pred_boxes,
    pred_obj_logits,
    gt_boxes,
    gt_objectness,
    phrase_mask,
    *,
    giou_weight: float = 1.0,
    objectness_weight: float = 1.0,
    use_temp_objectness: bool = True,
    eps: float = 1e-8,
) -> Dict[str, jnp.ndarray]:
    """Masked GIoU + L1 + objectness-BCE with reference normalization."""
    pred_boxes = pred_boxes.astype(jnp.float32)
    gt_boxes = gt_boxes.astype(jnp.float32)
    phrase_mask = phrase_mask.astype(jnp.float32)
    gt_objectness = gt_objectness.astype(jnp.float32)

    frame_phrase_mask = phrase_mask[:, None, :]                 # (B, 1, P)
    box_mask = frame_phrase_mask * gt_objectness                # (B, T, P)

    giou_elem = generalized_box_iou_loss(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(gt_boxes))
    giou_sum = (giou_elem * box_mask).sum()
    l1_sum = (jnp.abs(pred_boxes - gt_boxes).sum(-1) * box_mask).sum()

    num_bboxes = box_mask.sum()
    giou_loss = giou_weight * giou_sum / (num_bboxes + eps)
    l1_loss = giou_weight * l1_sum / (num_bboxes + eps)

    out = {"giou_loss": giou_loss, "l1_loss": l1_loss,
           "num_bboxes": num_bboxes}

    if use_temp_objectness:
        obj_elem = bce_with_logits(pred_obj_logits, gt_objectness)
        obj_mask = jnp.broadcast_to(frame_phrase_mask, obj_elem.shape)
        num_max_bboxes = obj_mask.sum()
        out["temp_objectness_loss"] = (
            objectness_weight * (obj_elem * obj_mask).sum()
            / (num_max_bboxes + eps))
        out["num_max_bboxes"] = num_max_bboxes
    return out


def grove_total_loss(
    lm_logits,
    labels,
    pred_boxes,
    pred_obj_logits,
    gt_boxes,
    gt_objectness,
    phrase_mask,
    *,
    ce_weight: float = 1.0,
    giou_weight: float = 1.0,
    objectness_weight: float = 1.0,
    use_temp_objectness: bool = True,
    ignore_index: int = -100,
) -> Dict[str, jnp.ndarray]:
    """Full GROVE loss dict: CE + GIoU + L1 (+ objectness BCE)."""
    ce = ce_weight * cross_entropy_lm_loss(lm_logits, labels, ignore_index)
    parts = grove_box_losses(
        pred_boxes, pred_obj_logits, gt_boxes, gt_objectness, phrase_mask,
        giou_weight=giou_weight, objectness_weight=objectness_weight,
        use_temp_objectness=use_temp_objectness)
    total = ce + parts["giou_loss"] + parts["l1_loss"]
    if use_temp_objectness:
        total = total + parts["temp_objectness_loss"]
    out = {"loss": total, "ce_loss": ce, **{k: v for k, v in parts.items()
                                            if k.endswith("loss")}}
    return out
