"""Host-side frame preprocessing for the two vision towers.

Numpy/PIL re-implementations of the reference's per-frame transforms
(`HowTo100M.py:309-313`):
  * CLIP: shortest-edge resize -> center crop -> rescale -> normalize
    (HF `CLIPImageProcessor` for openai/clip-vit-large-patch14-336);
  * SAM: `ResizeLongestSide` -> normalize -> bottom/right zero-pad to square
    (`model/SAM/utils/transforms.py`, `HowTo100M.py:168-178`).

Outputs are channels-LAST (H, W, 3) float32 — the TPU-native layout — vs the
reference's NCHW torch tensors.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


def clip_preprocess(frame: np.ndarray, size: int = 336) -> np.ndarray:
    """(H, W, 3) uint8 -> (size, size, 3) float32, CLIP-normalized."""
    img = Image.fromarray(frame)
    w, h = img.size
    short = min(w, h)
    scale = size / short
    new_w, new_h = round(w * scale), round(h * scale)
    img = img.resize((new_w, new_h), Image.BICUBIC)
    left = (new_w - size) // 2
    top = (new_h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def sam_preprocess(frame: np.ndarray, size: int = 512) -> np.ndarray:
    """(H, W, 3) uint8 -> (size, size, 3) float32, SAM-normalized + padded."""
    h, w = frame.shape[:2]
    scale = size / max(h, w)
    new_h, new_w = int(h * scale + 0.5), int(w * scale + 0.5)
    img = Image.fromarray(frame).resize((new_w, new_h), Image.BILINEAR)
    arr = (np.asarray(img, np.float32) - SAM_MEAN) / SAM_STD
    out = np.zeros((size, size, 3), np.float32)
    out[:new_h, :new_w] = arr
    return out


def preprocess_frames(frames: np.ndarray, clip_size: int = 336,
                      sam_size: int = 512) -> Tuple[np.ndarray, np.ndarray]:
    """(T, H, W, 3) uint8 -> (clip (T,c,c,3), sam (T,s,s,3)) float32."""
    clip = np.stack([clip_preprocess(f, clip_size) for f in frames])
    sam = np.stack([sam_preprocess(f, sam_size) for f in frames])
    return clip, sam


# ---------------------------------------------------------------------------
# uint8 variants: geometry on the host, normalization on the device.
# Host->device bandwidth is the input-pipeline bottleneck (uint8 is 4x
# smaller than float32); the model normalizes uint8 inputs in-graph
# (`grove_tpu.models.grove.GroveModel._norm_*`).
# ---------------------------------------------------------------------------

def clip_resize_uint8(frame: np.ndarray, size: int = 336) -> np.ndarray:
    """Resize + center crop only; returns uint8 (size, size, 3)."""
    img = Image.fromarray(frame)
    w, h = img.size
    scale = size / min(w, h)
    new_w, new_h = round(w * scale), round(h * scale)
    img = img.resize((new_w, new_h), Image.BICUBIC)
    left = (new_w - size) // 2
    top = (new_h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.uint8)


def sam_resize_uint8(frame: np.ndarray, size: int = 512) -> np.ndarray:
    """ResizeLongestSide + zero pad only; returns uint8 (size, size, 3)."""
    h, w = frame.shape[:2]
    scale = size / max(h, w)
    new_h, new_w = int(h * scale + 0.5), int(w * scale + 0.5)
    img = Image.fromarray(frame).resize((new_w, new_h), Image.BILINEAR)
    out = np.zeros((size, size, 3), np.uint8)
    out[:new_h, :new_w] = np.asarray(img, np.uint8)
    return out


# ---------------------------------------------------------------------------
# YUV420 shipping: video streams are natively 4:2:0, so shipping the raw
# planes (1.5 B/px) instead of converted RGB24 (3 B/px) halves the
# host->device bytes that bound e2e inference (benchmarks/h2d_probe.py:
# the relay moves ~27 MB/s). BT.601 LIMITED ("MPEG") range — what
# swscale uses for SD streams — so the device-side inverse reproduces
# the RGB the decoder's own conversion would have emitted to within
# rounding. Packed layout (3H/2, W): Y rows [0, H); U and V (H/2, W/2)
# side by side in rows [H, 3H/2) — `native/video_decoder.cc:vd_decode_at_yuv`.
# ---------------------------------------------------------------------------

YUV_OFFSET = np.array([16.0, 128.0, 128.0], np.float32)
RGB_TO_YUV = np.array([[65.738, 129.057, 25.064],
                       [-37.945, -74.494, 112.439],
                       [112.439, -94.154, -18.285]], np.float32) / 256.0
YUV_TO_RGB = np.array([[298.082, 0.0, 408.583],
                       [298.082, -100.291, -208.120],
                       [298.082, 516.412, 0.0]], np.float32) / 256.0


def rgb_to_yuv420(frames: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) uint8 RGB -> packed (T, 3H/2, W) uint8 YUV420P."""
    t, h, w, _ = frames.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    yuv = frames.astype(np.float32) @ RGB_TO_YUV.T + YUV_OFFSET
    yuv = np.clip(np.round(yuv), 0, 255).astype(np.float32)
    y = yuv[..., 0]
    # 2x2 mean chroma subsample
    u = yuv[..., 1].reshape(t, h // 2, 2, w // 2, 2).mean((2, 4))
    v = yuv[..., 2].reshape(t, h // 2, 2, w // 2, 2).mean((2, 4))
    out = np.empty((t, 3 * h // 2, w), np.uint8)
    out[:, :h] = np.clip(np.round(y), 0, 255).astype(np.uint8)
    out[:, h:, :w // 2] = np.clip(np.round(u), 0, 255).astype(np.uint8)
    out[:, h:, w // 2:] = np.clip(np.round(v), 0, 255).astype(np.uint8)
    return out


def yuv420_to_rgb(packed: np.ndarray) -> np.ndarray:
    """Packed (T, 3H/2, W) uint8 -> (T, H, W, 3) uint8 RGB (host mirror
    of the in-graph inverse; nearest-neighbor chroma upsample)."""
    t, h32, w = packed.shape
    h = h32 * 2 // 3
    y = packed[:, :h].astype(np.float32)
    u = packed[:, h:, :w // 2].astype(np.float32).repeat(2, 1).repeat(2, 2)
    v = packed[:, h:, w // 2:].astype(np.float32).repeat(2, 1).repeat(2, 2)
    yuv = np.stack([y, u, v], axis=-1) - YUV_OFFSET
    rgb = yuv @ YUV_TO_RGB.T
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def preprocess_frames_uint8(frames: np.ndarray, clip_size: int = 336,
                            sam_size: int = 512):
    """(T, H, W, 3) uint8 -> uint8 (clip, sam) frames + sam valid (h, w).

    SAM parity note: the reference normalizes BEFORE zero-padding, so pad
    pixels are exactly 0 post-normalization. The device normalizer uses the
    returned (valid_h, valid_w) to zero the pad region after normalizing.
    """
    clip = np.stack([clip_resize_uint8(f, clip_size) for f in frames])
    sam = np.stack([sam_resize_uint8(f, sam_size) for f in frames])
    h, w = frames.shape[1:3]
    scale = sam_size / max(h, w)
    valid = np.array([int(h * scale + 0.5), int(w * scale + 0.5)], np.int32)
    return clip, sam, valid
