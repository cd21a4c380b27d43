"""End-to-end data pipeline: synthetic pickles + clips -> dataset -> batch
-> tiny-model train forward -> finite loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.config import GroveConfig
from grove_tpu.data.collate import build_batch
from grove_tpu.data.datasets.howto100m import HowTo100MDataset
from grove_tpu.data.synthetic import make_synthetic_howto_dataset
from grove_tpu.data.video import VideoDecoder
from grove_tpu.models.grove import GroveModel, init_grove_params
from grove_tpu.text.mock_tokenizer import MockTokenizer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("howto")
    return make_synthetic_howto_dataset(str(root), num_videos=3)


def _dataset(synth_root, cfg, validation=False):
    ann_dir, video_dir, keys = synth_root
    return HowTo100MDataset(
        ann_dir=ann_dir, video_dir=video_dir, keys=keys,
        decoder_factory=VideoDecoder, num_frames=cfg.num_frames,
        clip_size=cfg.clip.image_size, sam_size=cfg.sam_enc.img_size,
        max_phrases=cfg.max_phrases, validation=validation)


def test_dataset_sample_shapes(synth_root):
    cfg = GroveConfig.tiny()
    ds = _dataset(synth_root, cfg)
    assert len(ds) == 3
    s = ds[0]
    t = cfg.num_frames
    assert s["frames_clip"].shape == (t, cfg.clip.image_size,
                                      cfg.clip.image_size, 3)
    assert s["frames_sam"].shape == (t, cfg.sam_enc.img_size,
                                     cfg.sam_enc.img_size, 3)
    assert s["gt_boxes"].shape == (t, cfg.max_phrases, 4)
    assert s["gt_objectness"].shape == (t, cfg.max_phrases)
    # boxes normalized
    assert s["gt_boxes"].max() <= 1.0 + 1e-6
    # objectness consistent with boxes: where obj==1 box has nonzero w/h
    obj = s["gt_objectness"].astype(bool)
    assert (s["gt_boxes"][obj][:, 2:] > 0).all()


def test_parse_matches_phrase_order(synth_root):
    cfg = GroveConfig.tiny()
    ds = _dataset(synth_root, cfg)
    ann = ds.load_annotation(0)
    # phrases sorted by span start
    starts = [s for s, _ in ann.tokens_positive]
    assert starts == sorted(starts)
    for (s, e), ph in zip(ann.tokens_positive, ann.phrases):
        assert ann.caption[s:e] == ph


def test_batch_and_train_forward(synth_root):
    cfg = GroveConfig.tiny()
    ds = _dataset(synth_root, cfg, validation=True)
    tok = MockTokenizer()
    samples = [ds[i] for i in range(2)]
    rng = np.random.default_rng(0)
    batch, meta = build_batch(samples, tok, cfg, rng)
    assert batch["input_ids"].shape[0] == 2
    assert batch["phrase_mask"].sum() >= 2  # at least one phrase per sample
    # det positions are consistent
    for b in range(2):
        for p, m in zip(batch["det_positions"][b], batch["phrase_mask"][b]):
            if m:
                assert batch["input_ids"][b][p + 1] == cfg.tokens.det

    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32, batch=2)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    out = model.apply(variables, jbatch, method=GroveModel.forward_train)
    assert np.isfinite(float(out["loss"]))


def test_uint8_device_normalization_matches_host(synth_root):
    """uint8 frames + on-device normalization == float host preprocessing."""
    import jax
    from grove_tpu.data.preprocess import (preprocess_frames,
                                           preprocess_frames_uint8)
    from grove_tpu.data.video import VideoDecoder
    cfg = GroveConfig.tiny()
    ann_dir, video_dir, keys = synth_root
    ds = _dataset(synth_root, cfg, validation=True)
    ann = ds.load_annotation(0)
    with VideoDecoder(ann.video_path) as dec:
        frames = dec.decode_at([0.0, 0.4])
    f_clip, f_sam = preprocess_frames(frames, cfg.clip.image_size,
                                      cfg.sam_enc.img_size)
    u_clip, u_sam, valid = preprocess_frames_uint8(
        frames, cfg.clip.image_size, cfg.sam_enc.img_size)

    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32)
    nc = model.apply(variables, jnp.asarray(u_clip[None]),
                     method=GroveModel._norm_clip)
    np.testing.assert_allclose(np.asarray(nc)[0], f_clip, atol=1e-5)
    ns = model.apply(variables, jnp.asarray(u_sam[None]),
                     jnp.asarray(valid[None]),
                     method=GroveModel._norm_sam)
    np.testing.assert_allclose(np.asarray(ns)[0], f_sam, atol=1e-5)


def test_run_inference_uint8_driver_path(synth_root):
    """The batched inference driver end-to-end on the uint8 ingest path:
    FullClipIGroundDataset emits uint8 frames + sam_valid_hw, the
    prefetch thread pre-uploads center stacks (`center_stacks`), and the
    valid sizes thread through generate_grounded -> encode_grounding_auto
    and the teacher-forced window pass. Must produce one output per clip
    with per-frame boxes covering every decoded frame."""
    from grove_tpu.infer.drivers import FullClipIGroundDataset, run_inference
    from grove_tpu.text.mock_tokenizer import MockTokenizer
    from grove_tpu.text.tokenizer import special_token_ids_from
    import dataclasses

    cfg = GroveConfig.tiny()
    tok = MockTokenizer()
    cfg = dataclasses.replace(cfg, tokens=special_token_ids_from(tok))
    ann_dir, video_dir, keys = synth_root
    ds = FullClipIGroundDataset(ann_dir, video_dir, cfg)
    assert len(ds) == 3
    s = ds[0]
    assert s["frames_clip"].dtype == np.uint8
    assert s["frames_sam"].dtype == np.uint8
    assert s["sam_valid_hw"].shape == (2,)

    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32)
    outs = run_inference(ds, model, variables, cfg, tok,
                         max_new_tokens=4, clip_batch=2, progress=False)
    assert len(outs) == 3
    for out in outs.values():
        t = len(out["frame_indices"])
        assert len(out["pred_bboxes"]) == t
        assert sorted(out["frame_indices"]) == list(range(t))


def test_device_preprocess_raw_path(synth_root):
    """Raw device-preprocess mode (`device_preprocess=True`): the dataset
    ships ONE raw uint8 copy per clip (frames_clip IS frames_sam),
    `center_stacks` uploads it once (fc is fs), the model runs the
    shortest-edge/longest-side geometry in-graph within ~2 uint8 levels
    of the host preprocessing, and the batched driver produces the same
    output surface end-to-end."""
    import dataclasses

    import jax
    from grove_tpu.data.preprocess import clip_preprocess, sam_preprocess
    from grove_tpu.infer.drivers import (FullClipIGroundDataset,
                                         run_inference)
    from grove_tpu.infer.sliding import center_stacks
    from grove_tpu.text.mock_tokenizer import MockTokenizer
    from grove_tpu.text.tokenizer import special_token_ids_from

    cfg = GroveConfig.tiny()
    tok = MockTokenizer()
    cfg = dataclasses.replace(cfg, tokens=special_token_ids_from(tok))
    ann_dir, video_dir, keys = synth_root
    ds = FullClipIGroundDataset(ann_dir, video_dir, cfg,
                                device_preprocess=True)
    s = ds[0]
    assert s["frames_clip"] is s["frames_sam"]
    assert s["frames_clip"].dtype == np.uint8
    assert "sam_valid_hw" not in s
    raw = s["frames_clip"]
    assert raw.shape[1:3] != (cfg.clip.image_size, cfg.clip.image_size)

    # in-graph geometry parity vs the host mirrors (PIL vs jax.image
    # resamplers differ by quantization-level amounts, not structure)
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32)
    nc = np.asarray(model.apply(variables, jnp.asarray(raw[None]),
                                method=GroveModel._norm_clip))[0]
    ns = np.asarray(model.apply(variables, jnp.asarray(raw[None]),
                                method=GroveModel._norm_sam))[0]
    hc = np.stack([clip_preprocess(f, cfg.clip.image_size) for f in raw])
    hs = np.stack([sam_preprocess(f, cfg.sam_enc.img_size) for f in raw])
    assert nc.shape == hc.shape and ns.shape == hs.shape
    assert np.abs(nc - hc).mean() < 0.02, np.abs(nc - hc).mean()
    assert np.abs(ns - hs).mean() < 0.02, np.abs(ns - hs).mean()
    # pad region is exactly zero (normalize-then-pad reference order)
    scale = cfg.sam_enc.img_size / max(raw.shape[1:3])
    vh = int(raw.shape[1] * scale + 0.5)
    assert np.all(ns[:, vh:, :] == 0.0)

    # one upload for both towers
    metas, fc, fs, valid = center_stacks([ds[0], ds[1]], cfg.num_frames)
    assert fs is fc and valid is None

    outs = run_inference(ds, model, variables, cfg, tok,
                         max_new_tokens=4, clip_batch=2, progress=False)
    assert len(outs) == 3
    for out in outs.values():
        t = len(out["frame_indices"])
        assert len(out["pred_bboxes"]) == t
        assert sorted(out["frame_indices"]) == list(range(t))


def test_device_preprocess_yuv_path(synth_root):
    """YUV420 shipping mode (`device_preprocess="yuv"`): the decoder
    emits packed (T, 3H/2, W) 4:2:0 planes (half the bytes of RGB24 —
    H2D bandwidth bounds e2e inference), the model converts BT.601
    limited-range + resizes in-graph, and the batched driver runs
    end-to-end. Conversion matrices mirror swscale's SD default
    (verified mean |d| 0.07 vs sws output on smooth frames; 4:2:0
    chroma subsampling is lossless for real 4:2:0 video sources)."""
    import dataclasses

    import jax
    from grove_tpu.data.preprocess import rgb_to_yuv420, yuv420_to_rgb
    from grove_tpu.infer.drivers import (FullClipIGroundDataset,
                                         run_inference)
    from grove_tpu.text.mock_tokenizer import MockTokenizer
    from grove_tpu.text.tokenizer import special_token_ids_from

    # in-graph YUV->RGB == host mirror exactly (same matrices, same
    # nearest-neighbor chroma upsample)
    cfg = GroveConfig.tiny()
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, size=(2, 48, 64, 3), dtype=np.uint8)
    yuv = rgb_to_yuv420(rgb)
    model = GroveModel(cfg, dtype=jnp.float32)
    dev = np.asarray(model.apply(
        {"params": {}}, jnp.asarray(yuv[None]),
        method=GroveModel._yuv420_to_rgb))[0]
    host = yuv420_to_rgb(yuv).astype(np.float32)
    assert np.abs(dev - host).max() <= 1.0, np.abs(dev - host).max()

    tok = MockTokenizer()
    cfg = dataclasses.replace(cfg, tokens=special_token_ids_from(tok))
    ann_dir, video_dir, keys = synth_root
    ds = FullClipIGroundDataset(ann_dir, video_dir, cfg,
                                device_preprocess="yuv")
    s = ds[0]
    assert s["frames_clip"] is s["frames_sam"]
    assert s["frames_clip"].ndim == 3          # packed (T, 3H/2, W)
    assert s["frames_clip"].dtype == np.uint8

    _, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
    model = GroveModel(cfg, dtype=jnp.float32)
    outs = run_inference(ds, model, variables, cfg, tok,
                         max_new_tokens=4, clip_batch=2, progress=False)
    assert len(outs) == 3
    for out in outs.values():
        t = len(out["frame_indices"])
        assert len(out["pred_bboxes"]) == t
        assert sorted(out["frame_indices"]) == list(range(t))
