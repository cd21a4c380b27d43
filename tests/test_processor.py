"""Public API end-to-end: synthetic clip -> GroveProcessor.generate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.api import GroveProcessor
from grove_tpu.config import GroveConfig
from grove_tpu.data.synthetic import make_synthetic_howto_dataset
from grove_tpu.models.grove import init_grove_params
from grove_tpu.text.mock_tokenizer import MockTokenizer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(3),
                                         dtype=jnp.float32)
    root = tmp_path_factory.mktemp("proc")
    _, video_dir, keys = make_synthetic_howto_dataset(
        str(root), num_videos=2, num_frames=20)
    videos = [f"{video_dir}/{k}.gif" for k in keys]
    return cfg, model, variables, videos[0], videos


def test_processor_generate_full_clip(setup):
    cfg, model, variables, video, _ = setup
    tok = MockTokenizer()
    proc = GroveProcessor(tok, cfg, fps=5.0)
    out = proc.generate(model, variables, video, max_new_tokens=8)
    n_frames = 20  # 20 frames at the clip's own 5 fps
    # every frame covered exactly once, in order
    assert out["frame_indices"] == list(range(n_frames))
    assert len(out["bboxes"]) == n_frames
    assert len(out["labels_per_frame"]) == n_frames
    assert len(out["probs_temp_objectness"]) == n_frames
    assert isinstance(out["text"], str)
    assert out["original_size"] == (96, 64)
    # each frame's boxes are (K, 4) with K <= num generated dets
    for b in out["bboxes"]:
        assert b.ndim == 2 and b.shape[1] == 4
    # boxes are unnormalized to pixel space
    flat = np.concatenate([b for b in out["bboxes"] if len(b)] or
                          [np.zeros((1, 4))])
    assert flat.max() <= 96 * 1.5 + 1e-5


def test_processor_no_dets_graceful(setup):
    """A generation with zero [DET] tokens must not crash."""
    cfg, model, variables, video, _ = setup
    tok = MockTokenizer()
    proc = GroveProcessor(tok, cfg, fps=5.0)
    # random tiny model may or may not emit DET; force a tiny budget so the
    # odds of zero dets are high, and assert the call succeeds either way
    out = proc.generate(model, variables, video, max_new_tokens=2)
    assert len(out["frame_indices"]) >= cfg.num_frames


def test_processor_generate_batch_ragged_instructions(setup):
    """Batched generation with per-clip (different-length) instructions
    matches the per-clip singles — exercises the left-padded ragged decode
    end-to-end through the public API."""
    cfg, model, variables, _, videos = setup
    tok = MockTokenizer()
    proc = GroveProcessor(tok, cfg, fps=5.0)
    instructions = ["describe briefly",
                    "describe every object and action you can see"]
    singles = [proc.generate(model, variables, v, instruction=ins,
                             max_new_tokens=4)
               for v, ins in zip(videos, instructions)]
    batched = proc.generate_batch(model, variables, videos,
                                  instructions=instructions,
                                  max_new_tokens=4)
    assert len(batched) == 2
    for one, few in zip(singles, batched):
        assert few["text"] == one["text"]
        assert few["frame_indices"] == one["frame_indices"]
        for ba, bb in zip(one["bboxes"], few["bboxes"]):
            np.testing.assert_allclose(ba, bb, rtol=2e-3, atol=2e-3)


def test_processor_decode_knobs(setup):
    """kv_cache_dtype / early_stop flow through to the decode loop and do
    not change the output on the tiny model; bad dtypes are rejected."""
    cfg, model, variables, video, _ = setup
    proc = GroveProcessor(MockTokenizer(), cfg, fps=5.0)
    ref = proc.generate(model, variables, video, max_new_tokens=6)
    for kw in ({"kv_cache_dtype": "int8"},
               {"kv_cache_dtype": "fp32", "early_stop": False},
               {"early_stop": False}):
        out = proc.generate(model, variables, video, max_new_tokens=6, **kw)
        assert out["text"] == ref["text"], kw
        assert out["frame_indices"] == ref["frame_indices"], kw
    with pytest.raises(ValueError):
        proc.generate(model, variables, video, kv_cache_dtype="int4")
