"""Golden-value regression guard.

Freezes the numerics of the tiny-model forward paths: any future refactor
that changes outputs (beyond float tolerance) fails here. Goldens are
committed under tests/goldens/ and regenerated intentionally with
`python -m tests.test_golden` (run as a module from the repo root).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.config import GroveConfig
from grove_tpu.models.grove import GroveModel, init_grove_params

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "tiny_forward.npz")


def _compute():
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(1234),
                                         dtype=jnp.float32, batch=1)
    rng = np.random.default_rng(99)
    t = cfg.num_frames
    nv = cfg.num_video_tokens
    L = nv + 10
    ids = rng.integers(3, 100, size=(1, L)).astype(np.int32)
    ids[:, 2:2 + nv] = 0
    ids[:, L - 2] = cfg.tokens.det
    batch = {
        "frames_clip": jnp.asarray(rng.normal(size=(
            1, t, cfg.clip.image_size, cfg.clip.image_size, 3))
            .astype(np.float32)),
        "frames_sam": jnp.asarray(rng.normal(size=(
            1, t, cfg.sam_enc.img_size, cfg.sam_enc.img_size, 3))
            .astype(np.float32)),
        "input_ids": jnp.asarray(ids),
        "video_start": jnp.full((1,), 2, jnp.int32),
        "labels": jnp.asarray(ids),
        "det_positions": jnp.full((1, cfg.max_phrases), L - 3, jnp.int32),
        "phrase_mask": jnp.asarray(
            np.array([[1, 0, 0, 0]], np.float32)),
        "gt_boxes": jnp.asarray(rng.uniform(0.3, 0.6, size=(
            1, t, cfg.max_phrases, 4)).astype(np.float32)),
        "gt_objectness": jnp.asarray(
            np.ones((1, t, cfg.max_phrases), np.float32)
            * np.array([[1, 0, 0, 0]], np.float32)[:, None]),
    }
    loss = model.apply(variables, batch, method=GroveModel.forward_train)
    boxes = model.apply(variables, batch, method=GroveModel.forward_boxes)
    return {
        "loss": np.asarray(loss["loss"]),
        "ce_loss": np.asarray(loss["ce_loss"]),
        "giou_loss": np.asarray(loss["giou_loss"]),
        "pred_boxes": np.asarray(boxes["pred_boxes"]),
        "objectness_logits": np.asarray(boxes["objectness_logits"]),
    }


def test_tiny_forward_matches_golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden file missing; regenerate with "
                    "`python -m tests.test_golden`")
    golden = np.load(GOLDEN_PATH)
    got = _compute()
    for k in golden.files:
        np.testing.assert_allclose(
            got[k], golden[k], rtol=5e-4, atol=5e-5,
            err_msg=f"{k} drifted from golden — if intentional, regenerate "
                    f"with `python -m tests.test_golden`")


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez(GOLDEN_PATH, **_compute())
    print(f"wrote goldens to {GOLDEN_PATH}")
