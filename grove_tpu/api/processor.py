"""Public inference API: one call, video in -> grounded caption out.

grove_tpu equivalent of the reference `grove_transformers.GroveProcessor`
(`processing_grove.py:263-432`): decodes the clip (native libav decoder at
5 fps), preprocesses for both towers, and runs the sliding-window pipeline,
returning the exact output dict of the reference:

  {text, text_tagged, phrases, center_frame_indices, frame_indices, bboxes,
   labels_per_frame, probs_temp_objectness, original_size}
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..config import GroveConfig
from ..data.preprocess import preprocess_frames
from ..data.video import VideoDecoder
from ..infer.sliding import infer_clip, infer_clips_batched
from ..text.prompts import VIDEO_GROUNDING_QUESTIONS


def _decode_kwargs(kv_cache_dtype: Optional[str], early_stop: bool,
                   temperature: float = 0.0, top_k: int = 0,
                   top_p: float = 1.0, seed: Optional[int] = None,
                   num_beams: int = 1,
                   length_penalty: float = 1.0) -> Dict:
    """Map user-facing strings to greedy-decode kwargs."""
    import jax
    import jax.numpy as jnp
    table = {None: jnp.bfloat16, "bf16": jnp.bfloat16,
             "bfloat16": jnp.bfloat16, "int8": jnp.int8,
             "fp32": jnp.float32, "float32": jnp.float32}
    if kv_cache_dtype not in table:
        raise ValueError(f"kv_cache_dtype must be one of "
                         f"{sorted(k for k in table if k)}, "
                         f"got {kv_cache_dtype!r}")
    if temperature < 0:
        raise ValueError(f"temperature must be >= 0, got {temperature}")
    if not 0 < top_p <= 1:
        raise ValueError(f"top_p must be in (0, 1], got {top_p}")
    if top_k < 0:
        raise ValueError(f"top_k must be >= 0, got {top_k}")
    if not 1 <= num_beams <= 16:
        raise ValueError(f"num_beams must be in [1, 16], got {num_beams}")
    if temperature == 0 and (top_k > 0 or top_p < 1):
        raise ValueError("top_k/top_p only apply to sampling; "
                         "set temperature > 0")
    if num_beams > 1 and temperature > 0:
        raise ValueError("num_beams > 1 is deterministic; "
                         "drop temperature or use num_beams=1")
    if num_beams > 1 and kv_cache_dtype == "int8":
        raise ValueError("num_beams > 1 requires a reorderable KV cache; "
                         "use kv_cache_dtype='bf16' or 'fp32'")
    out = {"cache_dtype": table[kv_cache_dtype],
           "early_exit": bool(early_stop),
           "temperature": float(temperature), "top_k": int(top_k),
           "top_p": float(top_p), "num_beams": int(num_beams),
           "length_penalty": float(length_penalty)}
    # a seed without sampling is inert — drop it so identical greedy
    # requests stay batchable (the serve layer groups by knob values)
    if seed is not None and temperature > 0:
        out["rng_key"] = jax.random.PRNGKey(seed)
    return out

DEFAULT_INSTRUCTION = VIDEO_GROUNDING_QUESTIONS[0]


class GroveProcessor:
    def __init__(self, tokenizer, cfg: GroveConfig, fps: float = 5.0,
                 decoder_factory=VideoDecoder):
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.fps = fps
        self.decoder_factory = decoder_factory

    def decode_video(self, video_path: str,
                     start_frame: Optional[int] = None,
                     end_frame: Optional[int] = None,
                     video_fps: Optional[float] = None,
                     max_frames: int = 1024) -> np.ndarray:
        """All frames at self.fps (reference decodes the full clip at 5 fps,
        `processing_grove.py:195-261`); optional frame-range crop."""
        with self.decoder_factory(video_path) as dec:
            src_fps = video_fps or dec.fps or self.fps
            if start_frame is not None and end_frame is not None:
                rate = max(int(src_fps / self.fps), 1)
                ts = [i / src_fps
                      for i in range(start_frame, end_frame + 1, rate)]
                return dec.decode_at(ts)
            return dec.decode_fps(self.fps, max_frames=max_frames)

    def generate(self, model, variables, video_path: str,
                 instruction: Optional[str] = None,
                 max_new_tokens: int = 64,
                 temp_objectness_threshold: Optional[float] = None,
                 start_frame: Optional[int] = None,
                 end_frame: Optional[int] = None,
                 video_fps: Optional[float] = None,
                 kv_cache_dtype: Optional[str] = None,
                 early_stop: bool = True, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0,
                 seed: Optional[int] = None, num_beams: int = 1,
                 length_penalty: float = 1.0) -> Dict:
        """`kv_cache_dtype`: None/'bf16' (default), 'int8' (half cache
        HBM, see ops/decode_attention.py), or 'fp32'. `early_stop` ends
        the decode loop once every sequence emitted EOS (identical ids).
        `temperature` > 0 enables stochastic sampling with optional
        `top_k` / nucleus `top_p` truncation, seeded by `seed`.
        `num_beams` > 1 switches to beam search (deterministic;
        `length_penalty` normalizes final scores, HF convention)."""
        frames = self.decode_video(video_path, start_frame, end_frame,
                                   video_fps)
        if frames.size == 0:
            raise ValueError(f"No frames decoded from {video_path}")
        original_size = (frames.shape[2], frames.shape[1])  # (W, H)
        frames_clip, frames_sam = preprocess_frames(
            frames, self.cfg.clip.image_size, self.cfg.sam_enc.img_size)
        return infer_clip(
            model, variables, self.cfg, self.tokenizer, frames_clip,
            frames_sam, original_size, instruction=instruction,
            max_new_tokens=max_new_tokens,
            threshold=temp_objectness_threshold,
            decode_kwargs=_decode_kwargs(kv_cache_dtype, early_stop,
                                         temperature, top_k, top_p, seed,
                                         num_beams, length_penalty))

    def generate_with_backend(self, model, variables, video_path: str,
                              decode_backend,
                              instruction: Optional[str] = None,
                              temp_objectness_threshold=None,
                              start_frame=None, end_frame=None,
                              video_fps=None) -> Dict:
        """`generate` with a pluggable decode backend (the continuous-
        batching serving engine supplies one; see serve/continuous.py).
        Greedy semantics; knobs live in the backend."""
        frames = self.decode_video(video_path, start_frame, end_frame,
                                   video_fps)
        if frames.size == 0:
            raise ValueError(f"No frames decoded from {video_path}")
        original_size = (frames.shape[2], frames.shape[1])
        frames_clip, frames_sam = preprocess_frames(
            frames, self.cfg.clip.image_size, self.cfg.sam_enc.img_size)
        return infer_clip(
            model, variables, self.cfg, self.tokenizer, frames_clip,
            frames_sam, original_size, instruction=instruction,
            threshold=temp_objectness_threshold,
            decode_backend=decode_backend)

    def generate_batch(self, model, variables, video_paths,
                       instructions=None, max_new_tokens: int = 64,
                       temp_objectness_threshold: Optional[float] = None,
                       kv_cache_dtype: Optional[str] = None,
                       early_stop: bool = True, temperature: float = 0.0,
                       top_k: int = 0, top_p: float = 1.0,
                       seed: Optional[int] = None, num_beams: int = 1,
                       length_penalty: float = 1.0):
        """Batched `generate` over several clips in one device launch.

        `instructions` may be None (default prompt), one string (shared), or
        a per-clip list — unequal prompts are left-padded and decoded in
        lockstep (grove_tpu extension; the reference processes clips one at
        a time, `infer_iground.py:150-295`). Returns a list of output dicts
        in input order.
        """
        samples = []
        for vp in video_paths:
            frames = self.decode_video(vp)
            if frames.size == 0:
                raise ValueError(f"No frames decoded from {vp}")
            fc, fs = preprocess_frames(
                frames, self.cfg.clip.image_size, self.cfg.sam_enc.img_size)
            samples.append({
                "frames_clip": fc, "frames_sam": fs,
                "original_size": (frames.shape[2], frames.shape[1]),
            })
        return infer_clips_batched(
            model, variables, self.cfg, self.tokenizer, samples,
            instruction=instructions, max_new_tokens=max_new_tokens,
            threshold=temp_objectness_threshold,
            decode_kwargs=_decode_kwargs(kv_cache_dtype, early_stop,
                                         temperature, top_k, top_p, seed,
                                         num_beams, length_penalty))
