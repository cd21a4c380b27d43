"""Batch inference drivers: dataset -> per-clip grounded predictions.

Rebuild of the reference `infer_iground.py` (and siblings): every rank
processes its shard of clips through the sliding-window pipeline
(`grove_tpu.infer.sliding.infer_clip`), results are merged across hosts and
deduplicated by unique clip id (`infer_iground.py:87-108,290-295`), and the
rank-0 process writes the predictions pickle consumed by the eval suite.

Run: python -m grove_tpu.infer.drivers --task iground --synthetic \
         --model_size tiny --output /tmp/preds.pkl
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GroveConfig
from ..data.preprocess import preprocess_frames
from ..data.video import VideoDecoder
from .sliding import infer_clip


class FullClipIGroundDataset:
    """Inference-time dataset: ALL frames at eval fps, no temporal sampling
    (`infer_iground.py:320-435`)."""

    def __init__(self, ann_dir: str, video_dir: str, cfg: GroveConfig,
                 fps: float = 5.0, keys: Optional[List[str]] = None,
                 decoder_factory=VideoDecoder, max_frames: int = 512,
                 device_preprocess: bool = False):
        from ..data.datasets.howto100m import parse_howto_annotation
        self._parse = parse_howto_annotation
        self.ann_dir = ann_dir
        self.video_dir = video_dir
        self.cfg = cfg
        self.fps = fps
        self.decoder_factory = decoder_factory
        self.max_frames = max_frames
        # device_preprocess: skip the host resizes and ship ONE raw copy
        # per clip; the model resizes/crops/pads in-graph
        # (GroveModel._norm_*). The relay moves ~27 MB/s host->device
        # (benchmarks/h2d_probe.py), so upload bytes bound e2e clips/s:
        # "yuv" ships the stream's native 4:2:0 planes (2.8 MB/clip at
        # 640x360), True ships raw RGB (5.5), False pre-resizes on host
        # (9.0 as two uint8 copies; float32 would be 36).
        self.device_preprocess = device_preprocess
        if keys is None:
            keys = sorted(os.path.splitext(f)[0]
                          for f in os.listdir(ann_dir) if f.endswith(".pkl"))
        self.keys = list(keys)

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index: int) -> Dict:
        with open(os.path.join(self.ann_dir, f"{self.keys[index]}.pkl"),
                  "rb") as f:
            ann_info = pickle.load(f)
        ann = self._parse(ann_info, self.video_dir)
        rate = max(int(ann.fps / self.fps), 1)
        ids = list(range(ann.clip_start_frame, ann.clip_end_frame + 1, rate))
        ts = [i / ann.fps for i in ids][:self.max_frames]
        out = {
            "original_size": (ann.width, ann.height),
            "video_id": self.keys[index],
            "clip_id": 0,
            "ann": ann,
        }
        with self.decoder_factory(ann.video_path) as dec:
            if self.device_preprocess == "yuv":
                frames = dec.decode_at_yuv(ts)
            else:
                frames = dec.decode_at(ts)
        if self.device_preprocess:
            # one raw array under BOTH keys (same object): windowing code
            # indexes either; center_stacks uploads it once
            out["frames_clip"] = out["frames_sam"] = frames
            return out
        # uint8 host pipeline: geometry here, normalization in-graph
        # (GroveModel._norm_*) — 4x less host->device traffic than f32
        from ..data.preprocess import preprocess_frames_uint8
        frames_clip, frames_sam, valid = preprocess_frames_uint8(
            frames, self.cfg.clip.image_size, self.cfg.sam_enc.img_size)
        out["frames_clip"] = frames_clip
        out["frames_sam"] = frames_sam
        out["sam_valid_hw"] = valid
        return out


class FullClipVidSTGDataset:
    """VidSTG inference: all tube frames at eval fps, caption given
    (`infer_vidstg.py:388-493`)."""

    def __init__(self, ann_path: str, video_dir: str, cfg: GroveConfig,
                 fps: float = 5.0, decoder_factory=VideoDecoder,
                 max_frames: int = 512):
        import json
        with open(ann_path) as f:
            self.annotations = json.load(f)
        self.video_dir = video_dir
        self.cfg = cfg
        self.fps = fps
        self.decoder_factory = decoder_factory
        self.max_frames = max_frames

    def __len__(self):
        return len(self.annotations["videos"])

    def __getitem__(self, index: int) -> Dict:
        from ..data.datasets.vidstg import parse_vidstg_video
        vinfo = self.annotations["videos"][index]
        ann = parse_vidstg_video(vinfo, self.annotations["trajectories"],
                                 self.video_dir, self.fps)
        rate = max(int(ann.fps / self.fps), 1)
        ids = list(range(ann.clip_start_frame, ann.clip_end_frame, rate))
        ids = ids[:self.max_frames]
        ts = [i / ann.fps for i in ids]
        with self.decoder_factory(ann.video_path) as dec:
            frames = dec.decode_at(ts)
        frames_clip, frames_sam = preprocess_frames(
            frames, self.cfg.clip.image_size, self.cfg.sam_enc.img_size)
        return {
            "frames_clip": frames_clip, "frames_sam": frames_sam,
            "original_size": (ann.width, ann.height),
            "video_id": str(vinfo["video_id"]),
            "qtype": vinfo.get("qtype", "declarative"),
            "caption": ann.caption,
            "frame_ids": ids,
        }


class FullClipPointingDataset:
    """GroundingYouTube / YouCook-Interactions inference: caption given,
    frames at annotation pts resampled to eval fps
    (`infer_groundingyoutube.py:287-330`)."""

    def __init__(self, ann_path: str, video_dir: str, cfg: GroveConfig,
                 fps: float = 5.0, decoder_factory=VideoDecoder,
                 segment_key: str = "segment_groundingyoutube_idx",
                 secs_key: str = "secs_absolute"):
        with open(ann_path, "rb") as f:
            self.annotations = pickle.load(f)
        self.video_dir = video_dir
        self.cfg = cfg
        self.fps = fps
        self.decoder_factory = decoder_factory
        self.segment_key = segment_key
        self.secs_key = secs_key

    def __len__(self):
        return len(self.annotations)

    def __getitem__(self, index: int) -> Dict:
        video = self.annotations[index]
        path = os.path.join(self.video_dir, video["video_fname"])
        rate = max(int(video["fps"] / self.fps), 1)
        pts = list(video["pts"])[::rate]
        if list(video["pts"])[-1] not in pts:
            pts.append(list(video["pts"])[-1])
        with self.decoder_factory(path) as dec:
            frames = dec.decode_at(pts)
        frames_clip, frames_sam = preprocess_frames(
            frames, self.cfg.clip.image_size, self.cfg.sam_enc.img_size)
        return {
            "frames_clip": frames_clip, "frames_sam": frames_sam,
            "original_size": (video["width"], video["height"]),
            "video_id": f"{video['video_id']}_{video[self.segment_key]}",
            "caption": video["caption"],
            "sampled_pts": pts,
            "target_secs": list(video[self.secs_key]),
        }


def run_caption_grounding(dataset, model, variables, cfg: GroveConfig,
                          tokenizer, *, task: str, rank: int = 0,
                          world: int = 1, progress: bool = True) -> Dict:
    """Caption-given grounding over a dataset shard (vidstg / pointing)."""
    from ..text.prompts import VIDEO_STG_QUESTIONS
    from .sliding import ground_clip_with_caption
    question = VIDEO_STG_QUESTIONS[0] if task == "vidstg" else None
    outputs: Dict[str, Dict] = {}
    for i in range(rank, len(dataset), world):
        t0 = time.time()
        s = dataset[i]
        out = ground_clip_with_caption(
            model, variables, cfg, tokenizer, s["frames_clip"],
            s["frames_sam"], s["original_size"], caption=s["caption"],
            question=question, use_objectness=False)
        if task == "vidstg":
            outputs[s["video_id"]] = {
                "frame_ids": s["frame_ids"],
                "boxes": out["bboxes"],
                "qtype": s["qtype"],
            }
        else:
            # map each target sec to the closest sampled pts
            # (`infer_groundingyoutube.py:216-219`)
            pts = s["sampled_pts"]
            pts_to_bbox = {p: b for p, b in zip(pts, out["bboxes"])}
            final_boxes, selected = [], []
            for sec in s["target_secs"]:
                closest = min(pts, key=lambda p: abs(p - sec))
                final_boxes.append(pts_to_bbox[closest])
                selected.append(closest)
            outputs[s["video_id"]] = {
                "pts_to_bbox": pts_to_bbox,
                "final_boxes": final_boxes,
                "selected_pts": selected,
            }
        if progress:
            print(f"[{rank}] {task} clip {s['video_id']}: "
                  f"{time.time() - t0:.1f}s", flush=True)
    return outputs


def update_and_sort_video_outputs(gathered: List[Dict]) -> Dict:
    """Merge per-rank result dicts, first occurrence wins
    (`infer_iground.py:87-108`)."""
    out = {}
    for results in gathered:
        for clip_id, data in results.items():
            if clip_id not in out:
                out[clip_id] = data
    return out


def run_inference(dataset, model, variables, cfg: GroveConfig, tokenizer,
                  *, max_new_tokens: int = 64, rank: int = 0, world: int = 1,
                  progress: bool = True, clip_batch: int = 4,
                  decode_kwargs: Optional[Dict] = None,
                  timing: Optional[List] = None) -> Dict:
    """Per-rank sliding-window inference over the dataset shard.

    Clips are processed in groups of `clip_batch`: the fixed-prompt
    center-window generation batches across the group (one device launch),
    then each clip's remaining windows run in one batched pass.

    `timing`, if given, collects one dict per group: `wait_s` (stall on
    the prefetch future — host decode + upload NOT hidden under device
    compute), `model_s` (batched generate + window passes + host
    postprocess), and the prefetch thread's own `load_s` (decode +
    preprocess) / `upload_s` (center-stack device_put) for the group —
    the e2e gap attribution of `benchmarks/e2e_ingest.py`."""
    from concurrent.futures import ThreadPoolExecutor
    from .sliding import center_stacks, infer_clips_batched
    video_outputs: Dict[str, Dict] = {}
    my_indices = list(range(rank, len(dataset), world))
    groups = [my_indices[g:g + clip_batch]
              for g in range(0, len(my_indices), clip_batch)]
    pool = ThreadPoolExecutor(max_workers=4)

    def load_group(idxs):
        t0 = time.time()
        samples = [dataset[i] for i in idxs]
        t1 = time.time()
        # upload the center-window stacks from the prefetch thread so the
        # host->device transfer overlaps the previous group's compute
        pre = center_stacks(samples, cfg.num_frames)  # completion forced
        return samples, pre, t1 - t0, time.time() - t1

    # prefetch: decode the next group's clips while the device computes
    futures = [pool.submit(load_group, g) for g in groups[:2]]
    for gi, idxs in enumerate(groups):
        t0 = time.time()
        samples, pre, load_s, upload_s = futures[gi].result()
        t_wait = time.time() - t0
        if gi + 2 < len(groups):
            futures.append(pool.submit(load_group, groups[gi + 2]))
        outs = infer_clips_batched(model, variables, cfg, tokenizer,
                                   samples, max_new_tokens=max_new_tokens,
                                   decode_kwargs=decode_kwargs,
                                   preloaded=pre)
        if timing is not None:
            timing.append({"wait_s": t_wait, "load_s": load_s,
                           "upload_s": upload_s,
                           "model_s": time.time() - t0 - t_wait})
        for sample, out in zip(samples, outs):
            uid = f"{sample['video_id']}_{sample['clip_id']}"
            video_outputs[uid] = {
                "pred_bboxes": out["bboxes"],
                "pred_labels": out["labels_per_frame"],
                "pred_phrases": out["phrases"],
                "pred_text": out["text"],
                "pred_text_tagged": out["text_tagged"],
                "probs_temp_objectness": out["probs_temp_objectness"],
                "original_size": out["original_size"],
                "frame_indices": out["frame_indices"],
            }
        if progress:
            print(f"[{rank}] clips {[s['video_id'] for s in samples]}: "
                  f"{time.time() - t0:.1f}s", flush=True)
    pool.shutdown(wait=False)
    return video_outputs


def gather_outputs(video_outputs: Dict) -> Dict:
    """All-gather per-rank result dicts across hosts (replaces
    `dist.all_gather_object`, `infer_iground.py:290-293`)."""
    if jax.process_count() == 1:
        return video_outputs
    from jax.experimental import multihost_utils
    import pickle as pkl
    blob = np.frombuffer(pkl.dumps(video_outputs), np.uint8)
    # pad to equal length across hosts
    n = np.array([len(blob)])
    max_n = int(multihost_utils.process_allgather(n).max())
    padded = np.zeros(max_n, np.uint8)
    padded[:len(blob)] = blob
    gathered = multihost_utils.process_allgather(padded)
    lens = multihost_utils.process_allgather(n)[:, 0]
    dicts = [pkl.loads(gathered[i, :int(lens[i])].tobytes())
             for i in range(gathered.shape[0])]
    return update_and_sort_video_outputs(dicts)


def main(argv=None):
    p = argparse.ArgumentParser(description="GROVE TPU batch inference")
    p.add_argument("--task", default="iground",
                   choices=["iground", "vidstg", "groundingyoutube",
                            "youcookinteractions", "anet"])
    p.add_argument("--frame_timestamps", default=None,
                   help="frame-timestamps json (anet task)")
    p.add_argument("--model_size", default="tiny",
                   choices=["tiny", "small", "full"])
    p.add_argument("--version", default=None,
                   help="torch .bin checkpoint to load")
    p.add_argument("--ann_dir", default=None)
    p.add_argument("--video_dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--output", default="predictions.pkl")
    p.add_argument("--max_new_tokens", default=64, type=int)
    p.add_argument("--max_frames", default=512, type=int)
    p.add_argument("--device_preprocess", default="host",
                   choices=["host", "rgb", "yuv"],
                   help="iground only: ship raw RGB or native YUV420 "
                        "frames and resize/normalize in-graph instead "
                        "of host preprocessing (halves/quarters "
                        "host->device bytes; geometry parity within "
                        "1-2 uint8 levels — see PARITY.md)")
    p.add_argument("--seed", default=42, type=int)
    # decode knobs (generation-bearing tasks; the reference is greedy-only)
    p.add_argument("--num_beams", default=1, type=int)
    p.add_argument("--temperature", default=0.0, type=float)
    p.add_argument("--top_k", default=0, type=int)
    p.add_argument("--top_p", default=1.0, type=float)
    p.add_argument("--kv_cache_dtype", default=None,
                   choices=["bf16", "int8", "fp32"])
    p.add_argument("--no_early_stop", action="store_true")
    args = p.parse_args(argv)

    cfg = {"tiny": GroveConfig.tiny, "small": GroveConfig.small,
           "full": GroveConfig}[args.model_size]()

    if args.synthetic:
        import tempfile
        root = tempfile.mkdtemp(prefix="grove_infer_")
        if args.task == "iground":
            from ..data.synthetic import make_synthetic_howto_dataset
            args.ann_dir, args.video_dir, _ = \
                make_synthetic_howto_dataset(root)
        elif args.task == "vidstg":
            from ..data.synthetic import make_synthetic_vidstg
            args.ann_dir, args.video_dir = make_synthetic_vidstg(root)
        elif args.task == "anet":
            import json as _json
            from ..data.synthetic import make_synthetic_anet
            args.ann_dir, args.video_dir, fts = make_synthetic_anet(root)
            args.frame_timestamps = os.path.join(root, "fts.json")
            with open(args.frame_timestamps, "w") as f:
                _json.dump(fts, f)
        else:
            from ..data.synthetic import make_synthetic_pointing
            key = ("segment_groundingyoutube_idx"
                   if args.task == "groundingyoutube"
                   else "segment_youcookinteractions_idx")
            secs = ("secs_absolute" if args.task == "groundingyoutube"
                    else "secs_relative")
            args.ann_dir, args.video_dir, _ = make_synthetic_pointing(
                root, segment_key=key, secs_key=secs)

    from ..train.driver import build_tokenizer
    tokenizer = build_tokenizer(args, cfg)
    import dataclasses
    from ..text.tokenizer import special_token_ids_from
    cfg = dataclasses.replace(cfg, tokens=special_token_ids_from(tokenizer))

    import jax.numpy as jnp
    from ..models.grove import init_grove_params
    dtype = jnp.float32 if args.model_size == "tiny" else jnp.bfloat16
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(args.seed),
                                         dtype=dtype)
    if args.version and os.path.exists(args.version):
        import torch
        from ..checkpoint.torch_convert import convert_state_dict, merge_into
        sd = torch.load(args.version, map_location="cpu")
        sd = {k: v.float().numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
        converted, report = convert_state_dict(sd, cfg)
        params, missing, mismatched = merge_into(variables["params"],
                                                 converted)
        variables = {"params": params}
        print(f"loaded {report['converted']} tensors")

    from ..api.processor import _decode_kwargs
    try:
        dk = _decode_kwargs(args.kv_cache_dtype, not args.no_early_stop,
                            args.temperature, args.top_k, args.top_p,
                            args.seed if args.temperature > 0 else None,
                            args.num_beams)
    except ValueError as e:
        p.error(str(e))
    if args.task in ("vidstg", "groundingyoutube", "youcookinteractions") \
            and (args.num_beams > 1 or args.temperature > 0
                 or args.kv_cache_dtype or args.no_early_stop):
        # these tasks ground a GIVEN caption — there is no generation
        # (and no KV-cache decode loop) for any of these flags to steer
        p.error(f"generation flags (--num_beams/--temperature/"
                f"--kv_cache_dtype/--no_early_stop) have no effect on "
                f"caption-given task {args.task!r}")

    if args.task == "iground":
        dataset = FullClipIGroundDataset(
            args.ann_dir, args.video_dir, cfg,
            max_frames=args.max_frames,
            device_preprocess={"host": False, "rgb": True,
                               "yuv": "yuv"}[args.device_preprocess])
        outputs = run_inference(dataset, model, variables, cfg, tokenizer,
                                max_new_tokens=args.max_new_tokens,
                                rank=jax.process_index(),
                                world=jax.process_count(),
                                decode_kwargs=dk)
    elif args.task == "vidstg":
        dataset = FullClipVidSTGDataset(args.ann_dir, args.video_dir, cfg,
                                        max_frames=args.max_frames)
        outputs = run_caption_grounding(
            dataset, model, variables, cfg, tokenizer, task="vidstg",
            rank=jax.process_index(), world=jax.process_count())
    elif args.task == "anet":
        import json as _json
        with open(args.frame_timestamps) as f:
            fts = _json.load(f)
        dataset = FullClipANetDataset(args.ann_dir, args.video_dir, fts, cfg)
        outputs = run_anet_inference(
            dataset, model, variables, cfg, tokenizer,
            max_new_tokens=args.max_new_tokens,
            rank=jax.process_index(), world=jax.process_count(),
            decode_kwargs=dk)
    else:
        key = ("segment_groundingyoutube_idx"
               if args.task == "groundingyoutube"
               else "segment_youcookinteractions_idx")
        secs = ("secs_absolute" if args.task == "groundingyoutube"
                else "secs_relative")
        dataset = FullClipPointingDataset(args.ann_dir, args.video_dir, cfg,
                                          segment_key=key, secs_key=secs)
        outputs = run_caption_grounding(
            dataset, model, variables, cfg, tokenizer, task=args.task,
            rank=jax.process_index(), world=jax.process_count())
    outputs = gather_outputs(outputs)
    if jax.process_index() == 0:
        with open(args.output, "wb") as f:
            pickle.dump(outputs, f)
        print(f"wrote {len(outputs)} clip predictions to {args.output}")
    return outputs


# ---------------------------------------------------------------------------
# ActivityNet-Entities inference (`infer_anet.py`)
# ---------------------------------------------------------------------------

class FullClipANetDataset:
    """10 segment-midpoint frames per segment, caption to be generated
    (`infer_anet.py:111-121` works on these 10 frames)."""

    def __init__(self, ann_path: str, video_dir: str,
                 frame_timestamps, cfg: GroveConfig,
                 decoder_factory=VideoDecoder, target_width: int = 720):
        from ..data.datasets.anet_entities import ActivityNetEntitiesDataset
        self.ds = ActivityNetEntitiesDataset(
            ann_path, video_dir, frame_timestamps, decoder_factory,
            num_frames=cfg.num_frames, clip_size=cfg.clip.image_size,
            sam_size=cfg.sam_enc.img_size, max_phrases=cfg.max_phrases,
            validation=True, target_width=target_width)
        self.cfg = cfg

    def __len__(self):
        return len(self.ds.segment_map)

    def __getitem__(self, index: int) -> Dict:
        from ..data.datasets.anet_entities import compute_midpoint_timestamps
        video_id, segment_id = self.ds.segment_map[index]
        ann = self.ds.parse_segment(video_id, segment_id)
        start, end = ann["timestamps"]
        end = min(end, self.ds.frame_timestamps[video_id][-2])
        midpoints = compute_midpoint_timestamps(start, end, 10)
        frames, w, h = self.ds.decode_frames(video_id, midpoints)
        frames_clip, frames_sam = preprocess_frames(
            frames, self.cfg.clip.image_size, self.cfg.sam_enc.img_size)
        return {
            "frames_clip": frames_clip, "frames_sam": frames_sam,
            "original_size": (w, h), "video_id": video_id,
            "segment_id": segment_id, "caption_gt": ann["caption"],
        }


def _phrase_word_indices(caption: str, phrases: List[str]) -> List[int]:
    """First-word index of each phrase in the caption (idx_in_sent)."""
    words = caption.lower().split()
    out = []
    for ph in phrases:
        first = ph.lower().split()[0] if ph.split() else ""
        idx = next((i for i, wd in enumerate(words) if first and first in wd),
                   -1)
        out.append(idx)
    return out


def run_anet_inference(dataset, model, variables, cfg: GroveConfig,
                       tokenizer, *, max_new_tokens: int = 64, rank: int = 0,
                       world: int = 1, progress: bool = True,
                       decode_kwargs: Optional[Dict] = None) -> Dict:
    """Sliding windows [0-8), [1-9), [2-10): generate on window 0, box-only
    passes for frames 8 and 9 (`infer_anet.py:111-292`). Emits the official
    submission structure {vid: {seg: {clss, idx_in_sent,
    bbox_for_all_frames}}}."""
    import numpy as np
    from ..text import tagging
    from ..text.packing import pack_text
    from ..text.prompts import grounding_prompt, tokenize_with_video
    from .generate import generate_grounded
    from .sliding import postprocess_window
    from ..models.grove import GroveModel
    import jax.numpy as jnp

    nf = cfg.num_frames
    outputs: Dict[str, Dict] = {}
    for i in range(rank, len(dataset), world):
        t0 = time.time()
        s = dataset[i]
        fc_all, fs_all = s["frames_clip"], s["frames_sam"]
        w0 = list(range(0, nf))
        prompt = grounding_prompt()
        pids = tokenize_with_video(prompt, tokenizer)
        packed = pack_text(pids, None, tokenizer,
                           num_video_tokens=cfg.num_video_tokens,
                           max_spliced_len=len(pids) - 1
                           + cfg.num_video_tokens,
                           det_token_id=cfg.tokens.det,
                           max_phrases=cfg.max_phrases,
                           pad_id=tokenizer.pad_token_id, with_labels=False)
        gen = generate_grounded(
            model, variables, cfg, tokenizer, packed.input_ids[None],
            np.asarray([packed.video_start]),
            jnp.asarray(fc_all[w0][None]), jnp.asarray(fs_all[w0][None]),
            max_new_tokens=max_new_tokens, **(decode_kwargs or {}))
        gen_ids = [int(t) for t in gen["generated_ids"][0]
                   if t != cfg.tokens.pad]
        raw = tokenizer.decode(gen_ids, skip_special_tokens=False)
        text_output = raw.replace("\n", "").replace("  ", " ")
        if "ASSISTANT: " in text_output:
            text_output = text_output.split("ASSISTANT: ")[-1]
        # generic markup repair (replaces the reference's hand-written
        # per-string fix-up table for malformed ANet generations,
        # `infer_anet.py:194-213`); text-only — boxes stay as generated
        text_output = tagging.repair_generation(text_output)
        parsed = tagging.parse_generation(text_output)
        phrases = parsed["phrases"]
        num_dets = int(gen["phrase_mask"][0].sum())

        boxes_by_frame, _, _ = postprocess_window(
            gen["pred_boxes"][0],
            None,                       # keep ALL det boxes per frame
            phrases, num_dets, s["original_size"], 0.0)

        # frames 8, 9 via teacher-forced windows [1-9) and [2-10)
        if num_dets > 0:
            ans_prompt = grounding_prompt(answer=text_output)
            aids = tokenize_with_video(ans_prompt, tokenizer)
            ap = pack_text(aids, None, tokenizer,
                           num_video_tokens=cfg.num_video_tokens,
                           max_spliced_len=len(aids) - 1
                           + cfg.num_video_tokens,
                           det_token_id=cfg.tokens.det,
                           max_phrases=cfg.max_phrases,
                           pad_id=tokenizer.pad_token_id, with_labels=False)
            extra_windows = [list(range(1, nf + 1)),
                             list(range(2, nf + 2))]
            batch = {
                "frames_clip": jnp.asarray(np.stack(
                    [fc_all[wdw] for wdw in extra_windows])),
                "frames_sam": jnp.asarray(np.stack(
                    [fs_all[wdw] for wdw in extra_windows])),
                "input_ids": jnp.asarray(np.tile(ap.input_ids[None],
                                                 (2, 1))),
                "video_start": jnp.full((2,), int(ap.video_start),
                                        jnp.int32),
                "det_positions": jnp.asarray(np.tile(
                    ap.det_positions[None], (2, 1))),
                "phrase_mask": jnp.asarray(np.tile(
                    ap.phrase_mask[None], (2, 1)).astype(np.float32)),
            }
            from .jit_utils import apply_jit
            out = apply_jit(model, variables, batch,
                            method="forward_boxes")
            pb = np.asarray(out["pred_boxes"], np.float32)
            n_tf = int(ap.phrase_mask.sum())
            for wi, wdw in enumerate(extra_windows):
                wb, _, _ = postprocess_window(pb[wi], None, phrases, n_tf,
                                              s["original_size"], 0.0)
                boxes_by_frame.append(wb[-1])   # last frame = nf+wi
        else:
            boxes_by_frame.extend([np.zeros((0, 4), np.float32)] * 2)

        # per-object 10-frame box lists
        n_obj = min(num_dets, len(phrases))
        bbox_for_all_frames = []
        for oi in range(n_obj):
            per_frame = []
            for f in range(10):
                fb = boxes_by_frame[f] if f < len(boxes_by_frame) else \
                    np.zeros((0, 4), np.float32)
                per_frame.append(fb[oi].tolist() if oi < len(fb)
                                 else [0.0, 0.0, 0.0, 0.0])
            bbox_for_all_frames.append(per_frame)

        vid = s["video_id"]
        outputs.setdefault(vid, {})[s["segment_id"]] = {
            "clss": phrases[:n_obj],
            "idx_in_sent": _phrase_word_indices(parsed["text"],
                                                phrases[:n_obj]),
            "bbox_for_all_frames": bbox_for_all_frames,
            "pred_text": parsed["text"],
        }
        if progress:
            print(f"[{rank}] anet {vid}/{s['segment_id']}: "
                  f"{time.time() - t0:.1f}s", flush=True)
    return outputs


if __name__ == "__main__":
    main()
