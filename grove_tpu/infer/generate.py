"""Greedy KV-cache generation + grounded-caption assembly.

TPU-native rebuild of the reference's `evaluate()` path
(`model/GROVE.py:412-451`): HF `generate` with per-step hidden-state capture
becomes a single jitted prefill + `lax.scan` decode loop whose carry holds the
KV caches; per-step post-final-norm hidden states are collected in a fixed
(B, max_new, D) buffer for [DET] gathering. Early stop is emulated by
freezing sequences after EOS (a fixed-length scan compiles once and has no
host round-trips per token — see SKILL gotcha on the axon relay).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GroveConfig
from ..models.grove import GroveModel
from ..models.llama import init_kv_caches
from ..text import tagging
from ..text.packing import det_gather_positions
from .jit_utils import apply_jit


def _make_sampler(temperature: float, top_k: int, top_p: float):
    """Token picker for the decode loop. temperature == 0 -> greedy
    argmax; otherwise temperature-scaled sampling with optional top-k and
    nucleus (top-p) truncation — the serving-side generation surface the
    reference's greedy-only `evaluate()` lacks (`model/GROVE.py:418-422`).
    """
    if temperature <= 0.0:
        def greedy(logits, key, step):
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return greedy

    def sample(logits, key, step):
        l = logits.astype(jnp.float32) / temperature
        if top_k > 0:
            kth = jax.lax.top_k(l, top_k)[0][..., -1:]
            l = jnp.where(l < kth, -jnp.inf, l)
        if top_p < 1.0:
            sorted_l = jnp.sort(l, axis=-1)[..., ::-1]
            probs = jax.nn.softmax(sorted_l, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs) < top_p
            # guarantee the top token survives even for degenerate top_p
            keep = keep.at[..., 0].set(True)
            thresh = jnp.min(jnp.where(keep, sorted_l, jnp.inf), axis=-1,
                             keepdims=True)
            l = jnp.where(l >= thresh, l, -jnp.inf)
        return jax.random.categorical(
            jax.random.fold_in(key, step), l, axis=-1).astype(jnp.int32)
    return sample


@functools.lru_cache(maxsize=32)
def _decode_fn(model: GroveModel, ls: int, max_new_tokens: int, eos_id: int,
               pad_id: int, cache_dtype, early_exit: bool,
               temperature: float, top_k: int, top_p: float):
    """One fused jit: prefill + greedy/sampling loop (single launch).

    `early_exit=True` runs the token loop as a `lax.while_loop` that stops
    as soon as EVERY sequence has emitted EOS — decode is HBM-bound
    (weights + KV cache re-read per step), so skipped steps are pure
    savings; real captions finish well before max_new_tokens (the
    reference's HF `generate` stops at EOS the same way,
    `model/GROVE.py:418-422`). Emitted ids are identical to the fixed-
    length scan (post-EOS slots are pad either way); hidden-state slots
    past the stop step stay zero, which downstream [DET] gathering never
    reads (det positions live inside the caption, before EOS)."""

    pick = _make_sampler(temperature, top_k, top_p)

    @jax.jit
    def run(variables, spliced_ids, video_embeds, video_start, pad_lens,
            rng_key):
        cfg = model.cfg
        b = spliced_ids.shape[0]
        d = cfg.llama.hidden_size
        caches = init_kv_caches(cfg.llama, b, ls + max_new_tokens,
                                dtype=cache_dtype)
        prefill_hidden, logits, caches = model.apply(
            variables, spliced_ids, video_embeds, video_start, caches,
            pad_lens, method=GroveModel.prefill)
        first_tok = pick(logits[:, -1, :], rng_key, 0)

        def one_step(tok, caches, done, i):
            hidden, logits, caches = model.apply(
                variables, tok[:, None], ls + i, caches, pad_lens,
                method=GroveModel.decode_step)
            next_tok = pick(logits[:, -1, :], rng_key, i + 1)
            emitted = jnp.where(done, pad_id, tok)
            done_next = done | (tok == eos_id)
            next_tok = jnp.where(done_next, pad_id, next_tok)
            return emitted, hidden[:, 0], next_tok, caches, done_next

        if early_exit:
            hid_dtype = prefill_hidden.dtype
            init = (jnp.int32(0), first_tok, caches,
                    jnp.zeros((b,), bool),
                    jnp.full((b, max_new_tokens), pad_id, jnp.int32),
                    jnp.zeros((b, max_new_tokens, d), hid_dtype))

            def cond(c):
                i, _, _, done, _, _ = c
                return (i < max_new_tokens) & ~jnp.all(done)

            def body(c):
                i, tok, caches, done, gen, hid = c
                emitted, h, next_tok, caches, done = one_step(
                    tok, caches, done, i)
                gen = jax.lax.dynamic_update_slice(gen, emitted[:, None],
                                                   (0, i))
                hid = jax.lax.dynamic_update_slice(
                    hid, h[:, None].astype(hid_dtype), (0, i, 0))
                return (i + 1, next_tok, caches, done, gen, hid)

            _, _, _, _, gen_ids, step_hidden = jax.lax.while_loop(
                cond, body, init)
        else:
            def step(carry, i):
                tok, caches, done = carry
                emitted, h, next_tok, caches, done = one_step(
                    tok, caches, done, i)
                return (next_tok, caches, done), (emitted, h)

            (_, _, _), (gen_ids, step_hidden) = jax.lax.scan(
                step, (first_tok, caches, jnp.zeros((b,), bool)),
                jnp.arange(max_new_tokens))
            gen_ids = gen_ids.T                          # (B, max_new)
            step_hidden = step_hidden.transpose(1, 0, 2)  # (B, max_new, D)
        hidden = jnp.concatenate([prefill_hidden, step_hidden], axis=1)
        return gen_ids, hidden

    return run


def greedy_decode(model: GroveModel, variables, spliced_ids, video_embeds,
                  video_start, *, max_new_tokens: int, eos_id: int,
                  pad_id: int = 0, cache_dtype=jnp.bfloat16, pad_lens=None,
                  early_exit: bool = True, temperature: float = 0.0,
                  top_k: int = 0, top_p: float = 1.0, rng_key=None):
    """Autoregressive generation. spliced_ids: (B, Ls); unequal prompts
    arrive LEFT-padded with `pad_lens` (B,) set (see `left_pad_prompts`).

    Greedy by default (the reference's `evaluate()` semantics);
    `temperature > 0` switches to stochastic sampling with optional
    `top_k` / nucleus `top_p` truncation, seeded by `rng_key` (a
    `jax.random` key; defaults to PRNGKey(0) for reproducibility).

    `early_exit` stops the on-device token loop once every sequence hit
    EOS (identical emitted ids; see `_decode_fn`). Set False to force the
    fixed-length scan (e.g. for benchmarking a full max_new_tokens run).

    Returns (generated_ids (B, max_new), hidden (B, Ls+max_new, D)).
    """
    b, ls = spliced_ids.shape
    if pad_lens is None:
        pad_lens = jnp.zeros((b,), jnp.int32)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    fn = _decode_fn(model, ls, max_new_tokens, int(eos_id), int(pad_id),
                    cache_dtype, bool(early_exit), float(temperature),
                    int(top_k), float(top_p))
    return fn(variables, spliced_ids, video_embeds, video_start,
              jnp.asarray(pad_lens, jnp.int32), rng_key)


def left_pad_prompts(prompts, video_starts, pad_id: int = 0,
                     pad_to_multiple: Optional[int] = None):
    """Ragged spliced prompts -> (ids (B, Lmax), video_start, pad_lens).

    Left padding keeps every prompt's last token at position Lmax-1 so the
    batched greedy scan stays in lockstep; attention masks the pad slots and
    RoPE positions are shifted per sample (prefill/decode_step).
    `pad_to_multiple` buckets Lmax so distinct prompt-length mixes reuse a
    handful of compiled decode shapes."""
    lens = [len(p) for p in prompts]
    lmax = max(lens)
    if pad_to_multiple:
        lmax = -(-lmax // pad_to_multiple) * pad_to_multiple
    b = len(prompts)
    ids = np.full((b, lmax), pad_id, np.int32)
    pad_lens = np.zeros((b,), np.int32)
    starts = np.asarray(video_starts, np.int64).copy()
    for i, p in enumerate(prompts):
        pad = lmax - lens[i]
        ids[i, pad:] = np.asarray(p, np.int32)
        pad_lens[i] = pad
        if starts[i] >= 0:
            starts[i] += pad
    return ids, starts.astype(np.int32), pad_lens


def generate_grounded(model: GroveModel, variables, cfg: GroveConfig,
                      tokenizer, spliced_ids: np.ndarray,
                      video_start: np.ndarray,
                      frames_clip, frames_sam, *,
                      max_new_tokens: int = 64, pad_lens=None,
                      cache_dtype=jnp.bfloat16, early_exit: bool = True,
                      temperature: float = 0.0, top_k: int = 0,
                      top_p: float = 1.0, rng_key=None,
                      num_beams: int = 1,
                      length_penalty: float = 1.0,
                      sam_valid_hw=None, spliced_ids_np=None) -> Dict:
    """Single-call grounded caption generation (evaluate-mode equivalent).

    Host orchestration: encoders -> greedy decode -> host det-position
    extraction -> grounding head. Returns raw arrays + parsed text fields.
    `cache_dtype` (jnp.bfloat16 / jnp.int8 / jnp.float32) and `early_exit`
    tune the KV-cache decode loop (see `greedy_decode`).
    """
    from .jit_utils import encode_grounding_auto
    video_embeds, _ = apply_jit(model, variables, frames_clip,
                                method="encode_video")
    image_embeddings = encode_grounding_auto(model, variables, frames_sam,
                                             sam_valid_hw)
    if num_beams > 1:
        from .beam import beam_decode
        gen_ids, hidden, _ = beam_decode(
            model, variables, jnp.asarray(spliced_ids), video_embeds,
            jnp.asarray(video_start), max_new_tokens=max_new_tokens,
            eos_id=cfg.tokens.eos, pad_id=cfg.tokens.pad,
            num_beams=num_beams, length_penalty=length_penalty,
            cache_dtype=cache_dtype, pad_lens=pad_lens,
            early_exit=early_exit)
    else:
        gen_ids, hidden = greedy_decode(
            model, variables, jnp.asarray(spliced_ids), video_embeds,
            jnp.asarray(video_start), max_new_tokens=max_new_tokens,
            eos_id=cfg.tokens.eos, pad_id=cfg.tokens.pad,
            pad_lens=pad_lens, cache_dtype=cache_dtype,
            early_exit=early_exit, temperature=temperature, top_k=top_k,
            top_p=top_p, rng_key=rng_key)

    gen_np = np.asarray(gen_ids)
    # spliced_ids may be a cached DEVICE array (infer_clips_batched);
    # callers pass the host copy alongside to avoid a fetch round trip
    if spliced_ids_np is None:
        spliced_ids_np = np.asarray(spliced_ids)
    full_ids = np.concatenate([spliced_ids_np, gen_np], axis=1)

    b = full_ids.shape[0]
    det_positions = np.zeros((b, cfg.max_phrases), np.int32)
    phrase_mask = np.zeros((b, cfg.max_phrases), bool)
    for i in range(b):
        pos, mask = det_gather_positions(full_ids[i], cfg.tokens.det,
                                         cfg.max_phrases)
        det_positions[i] = pos
        phrase_mask[i] = mask

    boxes, obj = apply_jit(model, variables, hidden,
                           jnp.asarray(det_positions), image_embeddings,
                           method="ground")

    outputs = []
    for i in range(b):
        toks = [int(t) for t in gen_np[i] if t != cfg.tokens.pad]
        text = tokenizer.decode(toks, skip_special_tokens=False)
        parsed = tagging.parse_generation(text)
        outputs.append(parsed)

    return {
        "generated_ids": gen_np,
        "pred_boxes": np.asarray(boxes, np.float32),
        "objectness_logits": (np.asarray(obj, np.float32)
                              if obj is not None else None),
        "det_positions": det_positions,
        "phrase_mask": phrase_mask,
        "parsed": outputs,
    }
