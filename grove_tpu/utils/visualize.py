"""Box-overlay visualization (reference `utils/markdown_utils.py` demo
utilities, PIL-only)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

_COLORS = [(255, 64, 64), (64, 200, 64), (64, 128, 255), (255, 200, 0),
           (200, 64, 255), (0, 220, 220), (255, 128, 0), (128, 128, 255)]


def draw_boxes(frame: np.ndarray, boxes, labels: Optional[Sequence[str]] =
               None, width: int = 2) -> np.ndarray:
    """(H, W, 3) uint8 + (K, 4) xyxy -> annotated uint8 frame."""
    img = Image.fromarray(frame.astype(np.uint8)).convert("RGB")
    draw = ImageDraw.Draw(img)
    for i, box in enumerate(np.asarray(boxes).reshape(-1, 4)):
        color = _COLORS[i % len(_COLORS)]
        draw.rectangle([float(box[0]), float(box[1]),
                        float(box[2]), float(box[3])],
                       outline=color, width=width)
        if labels is not None and i < len(labels):
            draw.text((float(box[0]) + 2, float(box[1]) + 2), labels[i],
                      fill=color)
    return np.asarray(img)


def render_grounded_clip(frames: np.ndarray, result: Dict,
                         out_path: Optional[str] = None):
    """Overlay a GroveProcessor.generate result onto decoded frames.

    frames: (T, H, W, 3) uint8 aligned with result["frame_indices"]. Returns
    annotated frames; writes an animated GIF when out_path is given."""
    out = []
    for i, fi in enumerate(result["frame_indices"]):
        if fi >= len(frames):
            continue
        out.append(draw_boxes(frames[fi], result["bboxes"][i],
                              result["labels_per_frame"][i]))
    out_np = np.stack(out) if out else frames
    if out_path:
        imgs = [Image.fromarray(f) for f in out_np]
        imgs[0].save(out_path, save_all=True, append_images=imgs[1:],
                     duration=200, loop=0)
    return out_np
