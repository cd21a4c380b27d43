"""VidSTG + pointing inference tasks end-to-end on synthetic data."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.config import GroveConfig
from grove_tpu.data.synthetic import (make_synthetic_pointing,
                                      make_synthetic_vidstg)
from grove_tpu.models.grove import init_grove_params
from grove_tpu.text.mock_tokenizer import MockTokenizer


@pytest.fixture(scope="module")
def tiny_model():
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(5),
                                         dtype=jnp.float32)
    return cfg, model, variables


def test_vidstg_infer_and_eval(tiny_model, tmp_path):
    cfg, model, variables = tiny_model
    ann_path, video_dir = make_synthetic_vidstg(str(tmp_path), num_videos=2,
                                                num_frames=12)
    from grove_tpu.infer.drivers import (FullClipVidSTGDataset,
                                         run_caption_grounding)
    ds = FullClipVidSTGDataset(ann_path, video_dir, cfg)
    tok = MockTokenizer()
    outputs = run_caption_grounding(ds, model, variables, cfg, tok,
                                    task="vidstg", progress=False)
    assert len(outputs) == 2
    for vid, data in outputs.items():
        assert len(data["boxes"]) == len(data["frame_ids"])
        assert data["qtype"] in ("declarative", "interrogative")

    # eval on the same annotations
    import json
    from grove_tpu.evals.vidstg import evaluate_vidstg
    with open(ann_path) as f:
        anns = json.load(f)
    gt = {}
    for v in anns["videos"]:
        traj = anns["trajectories"][v["original_video_id"]]["1"]
        fids = outputs[str(v["video_id"])]["frame_ids"]
        boxes = []
        for fid in fids:
            rec = traj.get(str(fid))
            if rec:
                x, y, w, h = rec["bbox"]
                boxes.append([x, y, x + w, y + h])
            else:
                boxes.append([])
        gt[str(v["video_id"])] = {"frame_ids": fids, "boxes": boxes}
    metrics = evaluate_vidstg(outputs, gt)
    assert "declarative_gt_viou" in metrics
    assert "interrogative_gt_viou" in metrics


def test_pointing_infer_and_eval(tiny_model, tmp_path):
    cfg, model, variables = tiny_model
    ann_path, video_dir, gt_data = make_synthetic_pointing(
        str(tmp_path), num_clips=2, num_frames=12)
    from grove_tpu.infer.drivers import (FullClipPointingDataset,
                                         run_caption_grounding)
    ds = FullClipPointingDataset(ann_path, video_dir, cfg)
    tok = MockTokenizer()
    outputs = run_caption_grounding(ds, model, variables, cfg, tok,
                                    task="groundingyoutube", progress=False)
    assert len(outputs) == 2
    for uid, data in outputs.items():
        assert len(data["final_boxes"]) == 2  # two target secs per clip

    from grove_tpu.evals.pointing import pointing_accuracy
    # adapt gt segment key
    for g in gt_data:
        g["segment_groundingyoutube_idx"] = g["segment_idx"]
    acc, correct, valid = pointing_accuracy(
        outputs, gt_data, segment_key="segment_groundingyoutube_idx")
    assert valid == 4
    assert 0.0 <= acc <= 100.0


def test_anet_infer_and_eval(tiny_model, tmp_path):
    cfg, model, variables = tiny_model
    from grove_tpu.data.synthetic import make_synthetic_anet
    ann_path, video_dir, frame_ts = make_synthetic_anet(str(tmp_path))
    from grove_tpu.infer.drivers import FullClipANetDataset, run_anet_inference
    ds = FullClipANetDataset(ann_path, video_dir, frame_ts, cfg,
                             target_width=96)
    assert len(ds) == 2
    tok = MockTokenizer()
    outputs = run_anet_inference(ds, model, variables, cfg, tok,
                                 max_new_tokens=6, progress=False)
    assert len(outputs) == 2
    for vid, segs in outputs.items():
        for seg, data in segs.items():
            assert "clss" in data and "bbox_for_all_frames" in data
            for obj_boxes in data["bbox_for_all_frames"]:
                assert len(obj_boxes) == 10

    import json
    from grove_tpu.evals.anet import gt_localization_accuracy, gen_grounding_f1
    with open(ann_path) as f:
        ref = json.load(f)
    m = gt_localization_accuracy(outputs, ref)
    assert 0.0 <= m["localization_accuracy"] <= 1.0
    assert m["num_classes"] >= 1
    f1 = gen_grounding_f1(outputs, ref)
    assert set(f1) == {"precision_all", "recall_all", "f1_all"}


def test_anet_train_dataset(tiny_model, tmp_path):
    cfg, model, variables = tiny_model
    from grove_tpu.data.synthetic import make_synthetic_anet
    from grove_tpu.data.datasets.anet_entities import ActivityNetEntitiesDataset
    from grove_tpu.data.video import VideoDecoder
    ann_path, video_dir, frame_ts = make_synthetic_anet(str(tmp_path))
    ds = ActivityNetEntitiesDataset(
        ann_path, video_dir, frame_ts, VideoDecoder,
        num_frames=cfg.num_frames, clip_size=cfg.clip.image_size,
        sam_size=cfg.sam_enc.img_size, max_phrases=cfg.max_phrases,
        validation=True, target_width=96)
    assert len(ds) == 2
    s = ds[0]
    assert s["frames_clip"].shape[0] == cfg.num_frames
    assert s["gt_boxes"].shape == (cfg.num_frames, cfg.max_phrases, 4)
    # phrase spans index into the caption
    for (a, b), ph in zip(s["tokens_positive"], s["phrases"]):
        assert ph in s["caption"][a:b] or s["caption"][a:b] in ph \
            or ph in s["caption"]
