"""Synthetic dataset generation: annotation pickles + tiny clips.

Produces a directory in the exact HowTo100M/iGround layout (per-video
pickles + video files) so the full data pipeline, training driver, and
inference drivers can run end-to-end without real data (no datasets ship in
this environment). Clips are animated GIFs (decodable by the native libav
decoder).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Tuple

import numpy as np
from PIL import Image

_OBJECTS = ["a red block", "the green ball", "a blue cup", "the yellow box"]
_VERBS = ["moves past", "touches", "circles around", "bumps into"]


def _make_clip(path: str, num_frames: int, width: int, height: int,
               fps: float, rng) -> None:
    frames = []
    base = rng.integers(0, 128, size=(height, width, 3), dtype=np.uint8)
    for i in range(num_frames):
        f = np.roll(base, shift=5 * i, axis=1).copy()
        frames.append(Image.fromarray(f))
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)


def make_synthetic_howto_dataset(root: str, num_videos: int = 4,
                                 num_frames: int = 16, width: int = 96,
                                 height: int = 64, fps: float = 5.0,
                                 seed: int = 0) -> Tuple[str, str, List[str]]:
    """Create ann_dir + video_dir with `num_videos` synthetic clips.

    Returns (ann_dir, video_dir, keys)."""
    rng = np.random.default_rng(seed)
    ann_dir = os.path.join(root, "annotations")
    video_dir = os.path.join(root, "videos")
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(video_dir, exist_ok=True)
    keys = []
    for v in range(num_videos):
        vid = f"vid{v:04d}"
        keys.append(vid)
        fname = f"{vid}.gif"
        _make_clip(os.path.join(video_dir, fname), num_frames, width, height,
                   fps, rng)

        n_phrases = int(rng.integers(1, 3))
        objs = list(rng.choice(len(_OBJECTS), size=n_phrases, replace=False))
        phrases = [_OBJECTS[i] for i in objs]
        verb = _VERBS[int(rng.integers(len(_VERBS)))]
        if n_phrases == 1:
            caption = f"{phrases[0]} {verb} the table"
        else:
            caption = f"{phrases[0]} {verb} {phrases[1]}"
        tagged = caption
        for ph in sorted(phrases, key=len, reverse=True):
            tagged = tagged.replace(ph, f"<p>{ph}</p>")

        bboxes, labels = [], []
        for f in range(num_frames):
            fb, fl = [], []
            for pi, ph in enumerate(phrases):
                visible = rng.uniform() > 0.3
                if visible:
                    x1 = float(rng.uniform(0, width / 2))
                    y1 = float(rng.uniform(0, height / 2))
                    fb.append([x1, y1, x1 + float(rng.uniform(8, width / 2)),
                               y1 + float(rng.uniform(8, height / 2))])
                    fl.append(ph)
            bboxes.append(fb)
            labels.append(fl)

        ann = {
            "video_fname": fname,
            "fps": fps,
            "clip_start_frame": 0,
            "clip_end_frame": num_frames - 1,
            "width": width,
            "height": height,
            "caption": caption,
            "tagged_caption": tagged,
            "phrases": phrases,
            "bboxes": bboxes,
            "labels": labels,
        }
        with open(os.path.join(ann_dir, f"{vid}.pkl"), "wb") as f:
            pickle.dump(ann, f)
    return ann_dir, video_dir, keys
