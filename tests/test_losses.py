"""Loss tests: masked static losses vs an independent ragged numpy oracle that
follows the reference accumulation semantics (`model/GROVE.py:339-408`)."""

import numpy as np
import jax.numpy as jnp

from grove_tpu.ops import losses
from grove_tpu.ops.boxes import box_cxcywh_to_xyxy


def _np_giou_loss(p, g):
    """Elementwise 1 - GIoU for xyxy numpy boxes."""
    x1 = np.maximum(p[:, 0], g[:, 0]); y1 = np.maximum(p[:, 1], g[:, 1])
    x2 = np.minimum(p[:, 2], g[:, 2]); y2 = np.minimum(p[:, 3], g[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_p = (p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1])
    area_g = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    union = area_p + area_g - inter
    iou = inter / (union + 1e-7)
    ex1 = np.minimum(p[:, 0], g[:, 0]); ey1 = np.minimum(p[:, 1], g[:, 1])
    ex2 = np.maximum(p[:, 2], g[:, 2]); ey2 = np.maximum(p[:, 3], g[:, 3])
    enc = np.clip(ex2 - ex1, 0, None) * np.clip(ey2 - ey1, 0, None)
    return 1 - (iou - (enc - union) / (enc + 1e-7))


def _np_bce(logit, target):
    return np.clip(logit, 0, None) - logit * target + np.log1p(np.exp(-np.abs(logit)))


def ragged_reference_losses(pred_boxes, pred_obj, gt_boxes, gt_obj,
                            phrase_mask, giou_w=1.0, obj_w=1.0):
    """Reference-style ragged accumulation (the oracle)."""
    B, T, P, _ = pred_boxes.shape
    giou = l1 = obj = 0.0
    num_bboxes = num_max = 0
    for b in range(B):
        npz = int(phrase_mask[b].sum())
        for t in range(T):
            pb = pred_boxes[b, t, :npz]
            ob = pred_obj[b, t, :npz]
            visible = gt_obj[b, t, :npz] > 0.5
            gtb = gt_boxes[b, t, :npz][visible]
            if gtb.shape[0] != 0:
                pv = pb[visible]
                giou += _np_giou_loss(
                    np.asarray(box_cxcywh_to_xyxy(pv)),
                    np.asarray(box_cxcywh_to_xyxy(gtb))).sum()
                l1 += np.abs(pv - gtb).sum()
            obj += _np_bce(ob, gt_obj[b, t, :npz]).sum()
            num_bboxes += gtb.shape[0]
            num_max += npz
    return {
        "giou_loss": giou_w * giou / (num_bboxes + 1e-8),
        "l1_loss": giou_w * l1 / (num_bboxes + 1e-8),
        "temp_objectness_loss": obj_w * obj / (num_max + 1e-8),
    }


def test_box_losses_match_ragged_oracle(rng):
    B, T, P = 2, 3, 4
    pred = rng.uniform(0.2, 0.8, size=(B, T, P, 4)).astype(np.float32)
    gt = rng.uniform(0.2, 0.8, size=(B, T, P, 4)).astype(np.float32)
    pred_obj = rng.normal(size=(B, T, P)).astype(np.float32)
    phrase_mask = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], dtype=np.float32)
    gt_obj = (rng.uniform(size=(B, T, P)) > 0.4).astype(np.float32)
    gt_obj *= phrase_mask[:, None, :]
    # zero out gt boxes where not visible (padding convention)
    gt = gt * gt_obj[..., None]

    got = losses.grove_box_losses(
        jnp.asarray(pred), jnp.asarray(pred_obj), jnp.asarray(gt),
        jnp.asarray(gt_obj), jnp.asarray(phrase_mask),
        giou_weight=2.0, objectness_weight=0.5)
    want = ragged_reference_losses(pred, pred_obj, gt, gt_obj, phrase_mask,
                                   giou_w=2.0, obj_w=0.5)
    for k in ("giou_loss", "l1_loss", "temp_objectness_loss"):
        np.testing.assert_allclose(float(got[k]), want[k], rtol=2e-4,
                                   err_msg=k)


def test_ce_loss_matches_manual(rng):
    B, L, V = 2, 6, 11
    logits = rng.normal(size=(B, L, V)).astype(np.float32)
    labels = rng.integers(0, V, size=(B, L))
    labels[0, :3] = -100
    got = float(losses.cross_entropy_lm_loss(jnp.asarray(logits),
                                             jnp.asarray(labels)))
    # manual shifted CE
    sl = logits[:, :-1]
    tl = labels[:, 1:]
    ps = np.exp(sl - sl.max(-1, keepdims=True))
    ps = ps / ps.sum(-1, keepdims=True)
    total = n = 0.0
    for b in range(B):
        for i in range(L - 1):
            if tl[b, i] != -100:
                total += -np.log(ps[b, i, tl[b, i]])
                n += 1
    np.testing.assert_allclose(got, total / n, rtol=1e-5)


def test_total_loss_composition(rng):
    B, L, V, T, P = 1, 5, 7, 2, 2
    logits = rng.normal(size=(B, L, V)).astype(np.float32)
    labels = rng.integers(0, V, size=(B, L))
    pred = rng.uniform(0.3, 0.7, size=(B, T, P, 4)).astype(np.float32)
    gt = rng.uniform(0.3, 0.7, size=(B, T, P, 4)).astype(np.float32)
    obj_logits = rng.normal(size=(B, T, P)).astype(np.float32)
    gt_obj = np.ones((B, T, P), np.float32)
    pm = np.ones((B, P), np.float32)
    out = losses.grove_total_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(pred),
        jnp.asarray(obj_logits), jnp.asarray(gt), jnp.asarray(gt_obj),
        jnp.asarray(pm), ce_weight=0.7)
    total = (float(out["ce_loss"]) + float(out["giou_loss"])
             + float(out["l1_loss"]) + float(out["temp_objectness_loss"]))
    np.testing.assert_allclose(float(out["loss"]), total, rtol=1e-6)
