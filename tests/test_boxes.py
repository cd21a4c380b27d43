import numpy as np
import jax.numpy as jnp

from grove_tpu.ops import boxes


def test_cxcywh_xyxy_roundtrip(rng):
    b = rng.uniform(0.1, 0.9, size=(5, 7, 4)).astype(np.float32)
    out = boxes.box_xyxy_to_cxcywh(boxes.box_cxcywh_to_xyxy(b))
    np.testing.assert_allclose(np.asarray(out), b, atol=1e-6)


def test_cxcywh_to_xyxy_values():
    b = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    out = np.asarray(boxes.box_cxcywh_to_xyxy(b))
    np.testing.assert_allclose(out, [[0.4, 0.3, 0.6, 0.7]], atol=1e-6)


def test_normalize_roundtrip(rng):
    b = rng.uniform(0, 300, size=(4, 4)).astype(np.float32)
    out = boxes.unnormalize_boxes(boxes.normalize_boxes(b, 320, 240), 320, 240)
    np.testing.assert_allclose(np.asarray(out), b, rtol=1e-5)


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    iou = np.asarray(boxes.box_iou_pairwise(a, b))
    np.testing.assert_allclose(iou, [1.0 / 7.0], atol=1e-5)


def test_identical_boxes_giou_is_one():
    a = jnp.array([[0.1, 0.2, 0.5, 0.9]])
    g = np.asarray(boxes.generalized_box_iou(a, a))
    np.testing.assert_allclose(g, [1.0], atol=1e-5)


def test_disjoint_boxes_giou():
    # IoU = 0; enclosing box area 4x1=4, union = 2 -> GIoU = 0 - 2/4 = -0.5
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[3.0, 0.0, 4.0, 1.0]])
    g = np.asarray(boxes.generalized_box_iou(a, b))
    np.testing.assert_allclose(g, [-0.5], atol=1e-5)


def test_iou_matrix_shape_and_diag(rng):
    a = rng.uniform(0, 1, size=(3, 4)).astype(np.float32)
    a[:, 2:] += 1.0  # ensure valid boxes
    m = np.asarray(boxes.box_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    assert m.shape == (3, 3)
    np.testing.assert_allclose(np.diag(m), np.ones(3), atol=1e-4)
