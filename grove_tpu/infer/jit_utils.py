"""Cached jitted apply wrappers.

On the axon TPU relay, eager (non-jit) execution dispatches one primitive at
a time and is pathologically slow (see .claude/skills/verify/SKILL.md), so
every model.apply on a hot path must go through jit. jax.jit caches on
callable identity, so wrappers are memoized per (model, method) — flax
modules are frozen dataclasses and hash by config.
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=128)
def jitted_method(model, method_name: str):
    method = getattr(type(model), method_name)

    @jax.jit
    def run(variables, *args):
        return model.apply(variables, *args, method=method)

    return run


def apply_jit(model, variables, *args, method: str):
    return jitted_method(model, method)(variables, *args)


# Measured-safe frames-per-launch ceiling for the SAM tower: 128 frames
# (batch 16 x 8) runs clean; 256 frames (batch 32) faulted the TPU worker
# inside SAM encode (kernel fault, NOTES_ROUND2). Oversize requests are
# scanned in chunks inside ONE jit, so any batch degrades to more
# sequential launches instead of crashing the worker. Overridable for
# memory-tight integrated runs (smaller chunks shrink the SAM stage's
# transient activations — the b24 e2e driver path OOMs with 96-frame
# chunks next to the 4.4 GB decode KV allocation, NOTES_ROUND5).
import os as _os

SAM_MAX_FRAMES = int(_os.environ.get("GROVE_SAM_MAX_FRAMES", "128"))


@functools.lru_cache(maxsize=32)
def _jitted_grounding_chunked(model, nch: int, with_valid: bool):
    method = type(model).encode_grounding

    @jax.jit
    def run(variables, frames, valid):  # (B, T, H, W, 3), B % nch == 0
        b = frames.shape[0]
        fr = frames.reshape(nch, b // nch, *frames.shape[1:])
        if with_valid:
            vr = valid.reshape(nch, b // nch, 2)
            out = jax.lax.map(
                lambda fv: model.apply(variables, fv[0], fv[1],
                                       method=method), (fr, vr))
        else:
            out = jax.lax.map(
                lambda ff: model.apply(variables, ff, method=method), fr)
        return out.reshape(out.shape[0] * out.shape[1], *out.shape[2:])

    return run


def encode_grounding_auto(model, variables, frames_sam, valid_hw=None,
                          max_frames: int = SAM_MAX_FRAMES):
    """SAM grounding encode with automatic frame chunking.

    Splits the clip batch into the fewest chunks keeping each SAM launch
    at <= max_frames frames (the measured-safe ceiling); single-chunk
    batches take the plain jitted path unchanged. `valid_hw` (B, 2)
    int32 marks the un-padded region of uint8 frames (see
    `GroveModel._norm_sam`)."""
    b, t = frames_sam.shape[:2]
    nch = 1
    while ((b + nch - 1) // nch) * t > max_frames or b % nch:
        nch += 1
        if nch >= b:
            nch = b
            break
    if nch <= 1:
        if valid_hw is not None:
            return apply_jit(model, variables, frames_sam, valid_hw,
                             method="encode_grounding")
        return apply_jit(model, variables, frames_sam,
                         method="encode_grounding")
    return _jitted_grounding_chunked(model, nch, valid_hw is not None)(
        variables, frames_sam, valid_hw)
