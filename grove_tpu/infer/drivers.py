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
                 decoder_factory=VideoDecoder, max_frames: int = 512):
        from ..data.datasets.howto100m import parse_howto_annotation
        self._parse = parse_howto_annotation
        self.ann_dir = ann_dir
        self.video_dir = video_dir
        self.cfg = cfg
        self.fps = fps
        self.decoder_factory = decoder_factory
        self.max_frames = max_frames
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
        with self.decoder_factory(ann.video_path) as dec:
            frames = dec.decode_at(ts)
        frames_clip, frames_sam = preprocess_frames(
            frames, self.cfg.clip.image_size, self.cfg.sam_enc.img_size)
        return {
            "frames_clip": frames_clip,
            "frames_sam": frames_sam,
            "original_size": (ann.width, ann.height),
            "video_id": self.keys[index],
            "clip_id": 0,
            "ann": ann,
        }


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
                  progress: bool = True) -> Dict:
    """Per-rank sliding-window inference over the dataset shard."""
    video_outputs: Dict[str, Dict] = {}
    for i in range(rank, len(dataset), world):
        t0 = time.time()
        sample = dataset[i]
        out = infer_clip(model, variables, cfg, tokenizer,
                         sample["frames_clip"], sample["frames_sam"],
                         sample["original_size"],
                         max_new_tokens=max_new_tokens)
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
            print(f"[{rank}] clip {uid}: {len(out['frame_indices'])} frames "
                  f"in {time.time() - t0:.1f}s -> '{out['text'][:60]}'",
                  flush=True)
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
    p.add_argument("--task", default="iground", choices=["iground"])
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
    p.add_argument("--seed", default=42, type=int)
    args = p.parse_args(argv)

    cfg = {"tiny": GroveConfig.tiny, "small": GroveConfig.small,
           "full": GroveConfig}[args.model_size]()

    if args.synthetic:
        import tempfile
        from ..data.synthetic import make_synthetic_howto_dataset
        root = tempfile.mkdtemp(prefix="grove_infer_")
        args.ann_dir, args.video_dir, _ = make_synthetic_howto_dataset(root)

    from ..train.driver import build_tokenizer
    tokenizer = build_tokenizer(args, cfg)

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

    dataset = FullClipIGroundDataset(args.ann_dir, args.video_dir, cfg,
                                     max_frames=args.max_frames)
    outputs = run_inference(dataset, model, variables, cfg, tokenizer,
                            max_new_tokens=args.max_new_tokens,
                            rank=jax.process_index(),
                            world=jax.process_count())
    outputs = gather_outputs(outputs)
    if jax.process_index() == 0:
        with open(args.output, "wb") as f:
            pickle.dump(outputs, f)
        print(f"wrote {len(outputs)} clip predictions to {args.output}")
    return outputs


if __name__ == "__main__":
    main()
