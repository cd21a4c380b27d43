"""RoIAlign numerics vs a naive oracle + region encoder shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.ops.roi_align import roi_align


def naive_roi_align(feat, roi, out_size, scale, ratio):
    """Scalar-loop oracle with mmcv aligned=True semantics. feat: (H,W,C)."""
    h, w, c = feat.shape
    x1, y1, x2, y2 = [r * scale - 0.5 for r in roi]
    bin_w = (x2 - x1) / out_size
    bin_h = (y2 - y1) / out_size
    out = np.zeros((out_size, out_size, c), np.float64)
    for i in range(out_size):
        for j in range(out_size):
            acc = np.zeros(c)
            for ky in range(ratio):
                for kx in range(ratio):
                    y = y1 + (i + (ky + 0.5) / ratio) * bin_h
                    x = x1 + (j + (kx + 0.5) / ratio) * bin_w
                    if y < -1.0 or y > h or x < -1.0 or x > w:
                        continue
                    y = min(max(y, 0.0), h - 1)
                    x = min(max(x, 0.0), w - 1)
                    y0, x0 = int(np.floor(y)), int(np.floor(x))
                    y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    ly, lx = y - y0, x - x0
                    acc += (feat[y0, x0] * (1 - ly) * (1 - lx)
                            + feat[y0, x1i] * (1 - ly) * lx
                            + feat[y1i, x0] * ly * (1 - lx)
                            + feat[y1i, x1i] * ly * lx)
            out[i, j] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_naive(rng):
    h, w, c = 12, 16, 3
    feat = rng.normal(size=(1, h, w, c)).astype(np.float32)
    rois = np.array([
        [0, 2.0, 1.0, 14.0, 10.0],
        [0, 0.0, 0.0, 16.0, 12.0],
        [0, 5.5, 3.25, 9.75, 8.5],
    ], np.float32)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               output_size=4, spatial_scale=1.0,
                               sampling_ratio=2))
    for k in range(len(rois)):
        want = naive_roi_align(feat[0], rois[k, 1:], 4, 1.0, 2)
        np.testing.assert_allclose(out[k], want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"roi {k}")


def test_roi_align_batch_indexing(rng):
    feat = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
    roi = [1.0, 1.0, 7.0, 7.0]
    rois = np.array([[0] + roi, [1] + roi], np.float32)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 2, 1.0))
    want0 = naive_roi_align(feat[0], roi, 2, 1.0, 2)
    want1 = naive_roi_align(feat[1], roi, 2, 1.0, 2)
    np.testing.assert_allclose(out[0], want0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[1], want1, rtol=1e-4, atol=1e-5)
    assert not np.allclose(out[0], out[1])


def test_region_module_shapes(rng):
    from grove_tpu.models.region import MLVLROIQueryModule
    b, p, c = 2, 16, 32   # 4x4 grid
    mlvl = tuple(jnp.asarray(rng.normal(size=(b, p, c)).astype(np.float32))
                 for _ in range(4))
    rois = jnp.asarray(rng.uniform(0.1, 0.9, size=(5, 4)).astype(np.float32))
    rois = rois.at[:, 2:].add(0.5)  # ensure x2>x1
    batch_idx = jnp.asarray(np.array([0, 0, 1, 1, 1]))
    mod = MLVLROIQueryModule(embed_dims=c, out_dims=64, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), mlvl, rois, batch_idx)
    out = mod.apply(variables, mlvl, rois, batch_idx)
    assert out.shape == (5, 64)
    assert np.isfinite(np.asarray(out)).all()
