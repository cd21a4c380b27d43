"""Full-clip sliding-window inference: caption once, boxes for every frame.

Rebuild of the reference inference core (`infer_iground.py:150-295`,
`processing_grove.py:305-432`):
  1. cover all frames with interleaved 8-frame windows + first-seen masks;
  2. generate the caption from the CENTER window (greedy KV decode);
  3. for every other window, run a teacher-forced pass with the generated
     caption as the answer to get that window's boxes;
  4. unnormalize boxes, threshold objectness into per-frame label lists,
     reorder everything by true frame index.

TPU delta vs the reference: all non-center windows run in ONE batched
`forward_boxes` call (batch = n_windows) instead of a python loop — the
text is identical across windows so the LM prefix batches trivially.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GroveConfig
from ..data.sampling import center_window_index, sliding_segment_with_mask
from ..models.grove import GroveModel
from ..text import tagging
from ..text.packing import pack_text
from ..text.prompts import grounding_prompt, tokenize_with_video
from .generate import generate_grounded, left_pad_prompts
from .jit_utils import apply_jit


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def postprocess_window(boxes: np.ndarray, obj_logits: Optional[np.ndarray],
                       phrases: List[str], num_dets: int,
                       original_size, threshold: float):
    """(T, P, 4) cxcywh01 + (T, P) logits -> per-frame filtered outputs.

    Mirrors `model/GROVE.py:305-319`: unnormalize cxcywh by (w, h), convert
    to xyxy, keep boxes whose objectness prob > threshold; labels are the
    phrases of the kept indices (guarded by i < len(phrases),
    `infer_iground.py:214`).
    """
    w, h = original_size
    t = boxes.shape[0]
    out_boxes, out_labels, out_probs = [], [], []
    for ti in range(t):
        b = boxes[ti, :num_dets].astype(np.float32)
        unnorm = b * np.array([w, h, w, h], np.float32)
        cx, cy, bw, bh = unnorm.T
        xyxy = np.stack([cx - bw / 2, cy - bh / 2,
                         cx + bw / 2, cy + bh / 2], axis=1)
        if obj_logits is not None:
            probs = _sigmoid(obj_logits[ti, :num_dets].astype(np.float32))
            keep = probs > threshold
            out_boxes.append(xyxy[keep])
            out_labels.append([phrases[i] for i in range(num_dets)
                               if keep[i] and i < len(phrases)])
            out_probs.append(probs)
        else:
            out_boxes.append(xyxy)
            out_labels.append([])
            out_probs.append(np.zeros((num_dets,), np.float32))
    return out_boxes, out_labels, out_probs


def ground_clip_with_caption(model: GroveModel, variables, cfg: GroveConfig,
                             tokenizer, frames_clip_all: np.ndarray,
                             frames_sam_all: np.ndarray, original_size, *,
                             caption: str, question: Optional[str] = None,
                             use_objectness: bool = False,
                             threshold: Optional[float] = None) -> Dict:
    """Caption-given grounding over every frame (no generation).

    The VidSTG / GroundingYouTube / YouCook inference mode
    (`infer_vidstg.py:156-217`): answer = "<p> caption </p> [DET]", all
    sliding windows run teacher-forced in one batched pass, one box per
    phrase per frame (objectness filtering optional). Returns
    {frame_indices, bboxes (per frame (K,4) xyxy unnormalized), probs}.
    """
    threshold = (threshold if threshold is not None
                 else cfg.temp_objectness_threshold)
    t_total = frames_clip_all.shape[0]
    nf = cfg.num_frames
    windows, masks = sliding_segment_with_mask(t_total, nf)

    answer = f"<p> {caption.strip()} </p> [DET]"
    prompt = grounding_prompt(question=question, answer=answer)
    ids = tokenize_with_video(prompt, tokenizer)
    spliced = len(ids) - 1 + cfg.num_video_tokens
    ap = pack_text(ids, None, tokenizer,
                   num_video_tokens=cfg.num_video_tokens,
                   max_spliced_len=-(-spliced // 64) * 64,
                   det_token_id=cfg.tokens.det,
                   max_phrases=cfg.max_phrases,
                   pad_id=tokenizer.pad_token_id, with_labels=False)
    num_dets = int(ap.phrase_mask.sum())

    live_real = [(w, m) for w, m in zip(windows, masks) if any(m)]
    nw_real = len(live_real)
    nw = _next_pow2(nw_real)
    live = live_real + [live_real[0]] * (nw - nw_real)
    batch = {
        "frames_clip": jnp.asarray(np.stack(
            [frames_clip_all[w] for w, _ in live])),
        "frames_sam": jnp.asarray(np.stack(
            [frames_sam_all[w] for w, _ in live])),
        "input_ids": jnp.asarray(np.tile(ap.input_ids[None], (nw, 1))),
        "video_start": jnp.full((nw,), int(ap.video_start), jnp.int32),
        "det_positions": jnp.asarray(np.tile(ap.det_positions[None],
                                             (nw, 1))),
        "phrase_mask": jnp.asarray(np.tile(ap.phrase_mask[None],
                                           (nw, 1)).astype(np.float32)),
    }
    out = apply_jit(model, variables, batch, method="forward_boxes")
    pb = np.asarray(out["pred_boxes"], np.float32)
    ob = (np.asarray(out["objectness_logits"], np.float32)
          if (use_objectness and out["objectness_logits"] is not None)
          else None)

    all_boxes, all_probs, seen_order = [], [], []
    for wi, (w, m) in enumerate(live_real):
        wb, _, wp = postprocess_window(pb[wi],
                                       ob[wi] if ob is not None else None,
                                       [caption], num_dets, original_size,
                                       threshold)
        for k, idx in enumerate(w):
            if m[k]:
                all_boxes.append(wb[k])
                all_probs.append(wp[k])
                seen_order.append(idx)
    order = sorted(range(len(seen_order)), key=lambda k: seen_order[k])
    return {
        "frame_indices": [seen_order[i] for i in order],
        "bboxes": [all_boxes[i] for i in order],
        "probs_temp_objectness": [all_probs[i] for i in order],
        "original_size": tuple(original_size),
    }


def infer_clip(model: GroveModel, variables, cfg: GroveConfig, tokenizer,
               frames_clip_all: np.ndarray, frames_sam_all: np.ndarray,
               original_size, *, instruction: Optional[str] = None,
               max_new_tokens: int = 64,
               threshold: Optional[float] = None,
               decode_kwargs: Optional[Dict] = None,
               decode_backend=None, sam_valid=None) -> Dict:
    """frames_*_all: (T_total, H, W, 3) preprocessed full-clip frames.

    `decode_kwargs` forwards knobs to the generation loop (e.g.
    `{"cache_dtype": jnp.int8, "early_exit": False}`).
    `decode_backend(spliced_ids (Lp,), video_start, fc, fs)` replaces the
    default `generate_grounded` call (used by the continuous-batching
    serving engine); it must return the same dict surface
    (generated_ids (1, n), pred_boxes, objectness_logits, phrase_mask)."""
    threshold = (threshold if threshold is not None
                 else cfg.temp_objectness_threshold)
    t_total = frames_clip_all.shape[0]
    nf = cfg.num_frames
    windows, masks = sliding_segment_with_mask(t_total, nf)
    ci = center_window_index(masks)
    center = windows[ci]

    # ---- center window: generate ----
    prompt = grounding_prompt(question=instruction)
    prompt_ids = tokenize_with_video(prompt, tokenizer)
    packed = pack_text(prompt_ids, None, tokenizer,
                       num_video_tokens=cfg.num_video_tokens,
                       max_spliced_len=len(prompt_ids) - 1
                       + cfg.num_video_tokens,
                       det_token_id=cfg.tokens.det,
                       max_phrases=cfg.max_phrases,
                       pad_id=tokenizer.pad_token_id, with_labels=False)

    fc = jnp.asarray(frames_clip_all[center][None])
    fs = jnp.asarray(frames_sam_all[center][None])
    if decode_backend is not None:
        gen = decode_backend(packed.input_ids, packed.video_start, fc, fs)
    else:
        gen = generate_grounded(model, variables, cfg, tokenizer,
                                packed.input_ids[None],
                                np.asarray([packed.video_start]),
                                fc, fs, max_new_tokens=max_new_tokens,
                                sam_valid_hw=(
                                    jnp.asarray(np.asarray(sam_valid)[None])
                                    if sam_valid is not None else None),
                                **(decode_kwargs or {}))

    gen_ids = [int(t) for t in gen["generated_ids"][0]
               if t != cfg.tokens.pad]
    raw_text = tokenizer.decode(gen_ids, skip_special_tokens=False)
    text_output = raw_text.replace("\n", "").replace("  ", " ")
    if "ASSISTANT: " in text_output:
        text_output = text_output.split("ASSISTANT: ")[-1]
    parsed = tagging.parse_generation(text_output)
    phrases = parsed["phrases"]
    num_dets = int(gen["phrase_mask"][0].sum())

    all_bboxes, all_labels, all_probs = postprocess_window(
        gen["pred_boxes"][0], (gen["objectness_logits"][0]
                               if gen["objectness_logits"] is not None
                               else None),
        phrases, num_dets, original_size, threshold)

    # ---- other windows: one batched teacher-forced pass ----
    return _finish_clip(model, variables, cfg, tokenizer, frames_clip_all,
                        frames_sam_all, original_size, windows, masks, ci,
                        center, text_output, parsed, phrases, num_dets,
                        threshold, instruction,
                        all_bboxes, all_labels, all_probs,
                        sam_valid=sam_valid)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# device copies of the (fixed-prompt, batch) spliced prompt arrays —
# see infer_clips_batched
_PROMPT_DEV_CACHE: Dict = {}


def _finish_clip(model, variables, cfg, tokenizer, frames_clip_all,
                 frames_sam_all, original_size, windows, masks, ci, center,
                 text_output, parsed, phrases, num_dets, threshold,
                 instruction, all_bboxes, all_labels, all_probs,
                 sam_valid=None):
    seen_order = list(center)
    other = [(j, w, m) for j, (w, m) in enumerate(zip(windows, masks))
             if j != ci and any(m)]
    if other and num_dets == 0:
        # no [DET] emitted (the reference would crash on an empty embed cat,
        # `model/GROVE.py:273`); emit empty outputs so every frame is covered
        for j, w, m in other:
            for k, idx in enumerate(w):
                if m[k]:
                    all_bboxes.append(np.zeros((0, 4), np.float32))
                    all_labels.append([])
                    all_probs.append(np.zeros((0,), np.float32))
                    seen_order.append(idx)
    elif other and num_dets > 0:
        answer_prompt = grounding_prompt(question=instruction,
                                         answer=text_output)
        ans_ids = tokenize_with_video(answer_prompt, tokenizer)
        # bucket the spliced length to multiples of 64: trailing pads are
        # causally inert, and bucketing caps recompiles across caption
        # lengths
        spliced = len(ans_ids) - 1 + cfg.num_video_tokens
        bucketed = -(-spliced // 64) * 64
        ap = pack_text(ans_ids, None, tokenizer,
                       num_video_tokens=cfg.num_video_tokens,
                       max_spliced_len=bucketed,
                       det_token_id=cfg.tokens.det,
                       max_phrases=cfg.max_phrases,
                       pad_id=tokenizer.pad_token_id, with_labels=False)
        # pad the window batch to the next power of two so distinct clip
        # lengths reuse a handful of compiled shapes
        nw_real = len(other)
        nw = _next_pow2(nw_real)
        padded = other + [other[0]] * (nw - nw_real)
        batch = {
            "frames_clip": jnp.asarray(np.stack(
                [frames_clip_all[w] for _, w, _ in padded])),
            "frames_sam": jnp.asarray(np.stack(
                [frames_sam_all[w] for _, w, _ in padded])),
            "input_ids": jnp.asarray(np.tile(ap.input_ids[None], (nw, 1))),
            "video_start": jnp.full((nw,), int(ap.video_start), jnp.int32),
            "det_positions": jnp.asarray(
                np.tile(ap.det_positions[None], (nw, 1))),
            "phrase_mask": jnp.asarray(
                np.tile(ap.phrase_mask[None], (nw, 1)).astype(np.float32)),
        }
        if sam_valid is not None:
            batch["sam_valid_hw"] = jnp.asarray(
                np.tile(np.asarray(sam_valid)[None], (nw, 1)))
        out = apply_jit(model, variables, batch, method="forward_boxes")
        pb = np.asarray(out["pred_boxes"], np.float32)
        ob = (np.asarray(out["objectness_logits"], np.float32)
              if out["objectness_logits"] is not None else None)
        n_dets_tf = int(ap.phrase_mask.sum())
        for wi, (j, w, m) in enumerate(other):
            wb, wl, wp = postprocess_window(
                pb[wi], ob[wi] if ob is not None else None, phrases,
                n_dets_tf, original_size, threshold)
            for k, idx in enumerate(w):
                if m[k]:
                    all_bboxes.append(wb[k])
                    all_labels.append(wl[k])
                    all_probs.append(wp[k])
                    seen_order.append(idx)

    order = sorted(range(len(seen_order)), key=lambda k: seen_order[k])
    return {
        "text": parsed["text"],
        "text_tagged": parsed["text_tagged"],
        "phrases": phrases,
        "center_frame_indices": list(center),
        "frame_indices": [seen_order[i] for i in order],
        "bboxes": [all_bboxes[i] for i in order],
        "labels_per_frame": [all_labels[i] for i in order],
        "probs_temp_objectness": [all_probs[i] for i in order],
        "original_size": tuple(original_size),
    }


import threading

# The relay moves ~27 MB/s host->device and CONCURRENT device_puts from
# separate threads collapse to ~4 MB/s each (benchmarks/h2d_probe.py,
# NOTES_ROUND5) — serialize every frame upload through one lock so
# prefetch threads queue instead of thrashing.
_upload_lock = threading.Lock()


def center_stacks(samples, nf: int):
    """Stack each clip's center-window frames onto the device.

    Returns (metas, frames_clip_dev, frames_sam_dev, valid_dev) where
    metas[i] = (windows, masks, center_index, center). Called by
    `infer_clips_batched` inline, or by the driver's PREFETCH thread so
    the host->device upload of the next group's frames overlaps the
    current group's compute. When a sample's frames_clip IS its
    frames_sam (the raw device-preprocess mode,
    `FullClipIGroundDataset(device_preprocess=True)`), the stack is
    uploaded ONCE and returned for both towers — upload bytes bound e2e
    clips/s at the relay's ~27 MB/s."""
    metas, fcs, fss, vals = [], [], [], []
    raw = all(s["frames_clip"] is s["frames_sam"] for s in samples)
    for s in samples:
        t_total = s["frames_clip"].shape[0]
        windows, masks = sliding_segment_with_mask(t_total, nf)
        ci = center_window_index(masks)
        center = windows[ci]
        metas.append((windows, masks, ci, center))
        fcs.append(s["frames_clip"][center])
        if not raw:
            fss.append(s["frames_sam"][center])
        if "sam_valid_hw" in s:
            vals.append(s["sam_valid_hw"])
    # all-or-none: a mixed batch would stack k != b valid rows and either
    # raise inside the jitted _norm_sam or silently broadcast one clip's
    # valid region onto every clip (ADVICE r4)
    assert not vals or len(vals) == len(samples), \
        (len(vals), len(samples), "samples mix sam_valid_hw presence")
    with _upload_lock:
        fc = jnp.asarray(np.stack(fcs))
        fs = fc if raw else jnp.asarray(np.stack(fss))
        valid = jnp.asarray(np.stack(vals)) if vals else None
        # force the wire transfers INSIDE the lock (block_until_ready
        # returns before the relay transfer completes — verify SKILL);
        # a scalar fetch can't resolve until the buffer is defined
        _ = np.asarray(fc[(0,) * fc.ndim])
        if fs is not fc:
            _ = np.asarray(fs[(0,) * fs.ndim])
    return metas, fc, fs, valid


def infer_clips_batched(model: GroveModel, variables, cfg: GroveConfig,
                        tokenizer, samples, *,
                        instruction: Optional[str] = None,
                        max_new_tokens: int = 64,
                        threshold: Optional[float] = None,
                        decode_kwargs: Optional[Dict] = None,
                        preloaded=None):
    """Batched variant of `infer_clip` over several clips.

    The iGround instruction prompt is FIXED (`infer_iground.py:62-85`), so
    the expensive center-window generation (encoders + prefill + 64-step
    decode) batches trivially across clips — one device launch for the whole
    group. `instruction` may also be a per-clip list of strings: unequal
    prompts are LEFT-padded (`left_pad_prompts`) and decoded in lockstep
    with pad slots masked out of attention. The per-clip teacher-forced
    window passes then run as in `infer_clip`. Returns a list of per-clip
    output dicts.
    """
    threshold = (threshold if threshold is not None
                 else cfg.temp_objectness_threshold)
    nf = cfg.num_frames
    b = len(samples)
    metas, fc_dev, fs_dev, valid_dev = (preloaded if preloaded is not None
                                        else center_stacks(samples, nf))

    if isinstance(instruction, (list, tuple)):
        instructions = list(instruction)
        assert len(instructions) == b
    else:
        instructions = [instruction] * b

    # The iGround instruction is FIXED, so every group's prompt batch is
    # the same arrays — cache the DEVICE copies so steady-state groups
    # skip ~4 small relay round trips per launch (each device_put is a
    # ~30 ms RTT through the relay; the e2e gap table attributes the
    # model_s - stage-sum residual to exactly these)
    ck = (tuple(instructions), b, id(tokenizer))
    cached = _PROMPT_DEV_CACHE.get(ck)
    if cached is None:
        prompt_rows, starts = [], []
        for ins in instructions:
            prompt_ids = tokenize_with_video(
                grounding_prompt(question=ins), tokenizer)
            packed = pack_text(prompt_ids, None, tokenizer,
                               num_video_tokens=cfg.num_video_tokens,
                               max_spliced_len=len(prompt_ids) - 1
                               + cfg.num_video_tokens,
                               det_token_id=cfg.tokens.det,
                               max_phrases=cfg.max_phrases,
                               pad_id=tokenizer.pad_token_id,
                               with_labels=False)
            prompt_rows.append(packed.input_ids)
            starts.append(int(packed.video_start))

        if len({len(r) for r in prompt_rows}) == 1:
            ids_np = np.stack(prompt_rows)
            ids = jnp.asarray(ids_np)
            vs = jnp.asarray(np.asarray(starts, np.int32))
            pad_lens = None
        else:
            ids_np, vs_np, pad_np = left_pad_prompts(
                prompt_rows, starts, pad_id=tokenizer.pad_token_id,
                pad_to_multiple=64)
            ids, vs = jnp.asarray(ids_np), jnp.asarray(vs_np)
            pad_lens = jnp.asarray(pad_np)
        if len(_PROMPT_DEV_CACHE) >= 16:
            _PROMPT_DEV_CACHE.clear()
        # host copy rides along: generate_grounded needs the ids on host
        # for det-position extraction, and np.asarray on the cached
        # DEVICE array would be a fetch round trip per group
        _PROMPT_DEV_CACHE[ck] = (ids, vs, pad_lens, ids_np)
    else:
        ids, vs, pad_lens, ids_np = cached

    gen = generate_grounded(
        model, variables, cfg, tokenizer, ids, vs, fc_dev, fs_dev,
        max_new_tokens=max_new_tokens, pad_lens=pad_lens,
        sam_valid_hw=valid_dev, spliced_ids_np=ids_np,
        **(decode_kwargs or {}))

    outputs = []
    for i, (s, (windows, masks, ci, center)) in enumerate(zip(samples,
                                                              metas)):
        gen_ids = [int(t) for t in gen["generated_ids"][i]
                   if t != cfg.tokens.pad]
        raw_text = tokenizer.decode(gen_ids, skip_special_tokens=False)
        text_output = raw_text.replace("\n", "").replace("  ", " ")
        if "ASSISTANT: " in text_output:
            text_output = text_output.split("ASSISTANT: ")[-1]
        parsed = tagging.parse_generation(text_output)
        phrases = parsed["phrases"]
        num_dets = int(gen["phrase_mask"][i].sum())
        all_bboxes, all_labels, all_probs = postprocess_window(
            gen["pred_boxes"][i],
            (gen["objectness_logits"][i]
             if gen["objectness_logits"] is not None else None),
            phrases, num_dets, s["original_size"], threshold)
        outputs.append(_finish_clip(
            model, variables, cfg, tokenizer, s["frames_clip"],
            s["frames_sam"], s["original_size"], windows, masks, ci, center,
            text_output, parsed, phrases, num_dets, threshold,
            instructions[i], all_bboxes, all_labels, all_probs,
            sam_valid=s.get("sam_valid_hw")))
    return outputs
