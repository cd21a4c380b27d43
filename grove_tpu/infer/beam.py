"""Beam-search decoding for grounded caption generation.

The reference generates greedily only (`model/GROVE.py:418-422` hardcodes
`num_beams=1` semantics); beam search is the standard quality knob HF
`generate` users reach for, so the TPU rebuild provides it: a single jitted
prefill + `lax.scan` over steps, carrying K beams per clip with their KV
caches expanded on the batch axis and reordered by gather after every
top-k re-ranking (the same cache-reorder HF's beam scorer does).

Shapes: batch B, beams K, flat rows R = B*K. Caches/hidden live on R;
scores/tokens on (B, K). A beam that emits EOS freezes (emits pad, score
fixed); final selection maximizes score / length**length_penalty, HF's
default normalization. The per-step hidden states of the winning beam are
returned so [DET] gathering works exactly as with greedy decode.

int8 KV caches are not supported here (their transposed layout would make
the per-step beam reorder a lane-dim gather); use bf16/fp32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.grove import GroveModel
from ..models.llama import init_kv_caches

NEG_INF = -1.0e9


def _gather_rows(tree, idx):
    """Gather dim-0 rows of every leaf (R, ...) by idx (R,)."""
    return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), tree)


@functools.lru_cache(maxsize=16)
def _beam_fn(model: GroveModel, ls: int, max_new_tokens: int, eos_id: int,
             pad_id: int, num_beams: int, length_penalty: float,
             cache_dtype, early_exit: bool):
    k = num_beams

    @jax.jit
    def run(variables, spliced_ids, video_embeds, video_start, pad_lens):
        cfg = model.cfg
        b = spliced_ids.shape[0]
        d = cfg.llama.hidden_size
        r = b * k

        caches = init_kv_caches(cfg.llama, b, ls + max_new_tokens,
                                dtype=cache_dtype)
        prefill_hidden, logits, caches = model.apply(
            variables, spliced_ids, video_embeds, video_start, caches,
            pad_lens, method=GroveModel.prefill)
        logprobs0 = jax.nn.log_softmax(
            logits[:, -1, :].astype(jnp.float32), axis=-1)   # (B, V)
        v = logprobs0.shape[-1]

        # seed K beams from the top-K first tokens
        top0, tok0 = jax.lax.top_k(logprobs0, k)             # (B, K)
        scores = top0                                         # (B, K)
        # expand caches/pad_lens to beam rows
        caches = jax.tree.map(lambda x: jnp.repeat(x, k, axis=0), caches)
        pad_r = jnp.repeat(pad_lens, k, axis=0)

        tokens = jnp.full((b, k, max_new_tokens), pad_id, jnp.int32)
        hidden_buf = jnp.zeros((r, max_new_tokens, d),
                               prefill_hidden.dtype)
        done = jnp.zeros((b, k), bool)
        cur = tok0.astype(jnp.int32)                          # (B, K)

        def step(carry, i):
            cur, scores, tokens, hidden_buf, caches, done = carry
            tok_flat = cur.reshape(r, 1)
            hidden, logits, new_caches = model.apply(
                variables, tok_flat, ls + i, caches, pad_r,
                method=GroveModel.decode_step)
            # record the token that produced this step's hidden state
            tokens = tokens.at[:, :, i].set(
                jnp.where(done, pad_id, cur))
            hidden_buf = jax.lax.dynamic_update_slice(
                hidden_buf, hidden[:, 0][:, None].astype(hidden_buf.dtype),
                (0, i, 0))

            lp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32),
                                    axis=-1).reshape(b, k, v)
            # frozen beams: only continuation is pad at no cost
            pad_row = jnp.full((v,), NEG_INF, jnp.float32).at[pad_id].set(0.0)
            lp = jnp.where(done[..., None], pad_row[None, None, :], lp)
            done_next = done | (cur == eos_id)
            lp = jnp.where((cur == eos_id)[..., None] & ~done[..., None],
                           pad_row[None, None, :], lp)

            cand = scores[..., None] + lp                     # (B, K, V)
            flat = cand.reshape(b, k * v)
            new_scores, flat_idx = jax.lax.top_k(flat, k)     # (B, K)
            beam_idx = flat_idx // v                          # (B, K)
            new_tok = (flat_idx % v).astype(jnp.int32)
            # final iteration: the token selected here would never be
            # recorded (tokens only holds max_new entries), so skip the
            # re-rank entirely — otherwise scores carry one unrecorded
            # token's log-prob and bias selection against unfrozen beams
            is_last = i == (max_new_tokens - 1)
            new_scores = jnp.where(is_last, scores, new_scores)
            beam_idx = jnp.where(is_last,
                                 jnp.broadcast_to(jnp.arange(k)[None],
                                                  (b, k)), beam_idx)
            new_tok = jnp.where(is_last, pad_id, new_tok)

            # reorder everything that lives per-beam
            row_idx = (jnp.arange(b)[:, None] * k + beam_idx).reshape(r)
            caches = _gather_rows(new_caches, row_idx)
            hidden_buf = jnp.take(hidden_buf, row_idx, axis=0)
            tokens = jnp.take_along_axis(tokens, beam_idx[..., None],
                                         axis=1)
            scores = new_scores
            done = jnp.take_along_axis(done_next, beam_idx, axis=1)
            cur = jnp.where(done, pad_id, new_tok)
            return (cur, scores, tokens, hidden_buf, caches, done), None

        init = (cur, scores, tokens, hidden_buf, caches, done)
        if early_exit:
            # stop once every beam of every clip has recorded its EOS
            # (post-stop steps would only shuffle tied pad continuations);
            # safe because `done` flips AFTER the EOS token and its hidden
            # state were recorded
            def cond(c):
                i, carry = c
                return (i < max_new_tokens) & ~jnp.all(carry[-1])

            def body(c):
                i, carry = c
                carry, _ = step(carry, i)
                return (i + 1, carry)

            _, (cur, scores, tokens, hidden_buf, caches, done) = \
                jax.lax.while_loop(cond, body, (jnp.int32(0), init))
        else:
            (cur, scores, tokens, hidden_buf, caches,
             done), _ = jax.lax.scan(step, init,
                                     jnp.arange(max_new_tokens))

        # sequence lengths: generated tokens before (and including) EOS
        lengths = jnp.sum(tokens != pad_id, axis=-1).astype(jnp.float32)
        lengths = jnp.maximum(lengths, 1.0)
        final = scores / (lengths ** length_penalty)
        best = jnp.argmax(final, axis=-1)                     # (B,)
        best_tokens = jnp.take_along_axis(
            tokens, best[:, None, None], axis=1)[:, 0]        # (B, max_new)
        best_rows = jnp.arange(b) * k + best
        best_hidden = jnp.take(hidden_buf, best_rows, axis=0)
        hidden = jnp.concatenate([prefill_hidden, best_hidden], axis=1)
        return best_tokens, hidden, final

    return run


def beam_decode(model: GroveModel, variables, spliced_ids, video_embeds,
                video_start, *, max_new_tokens: int, eos_id: int,
                num_beams: int = 4, pad_id: int = 0,
                length_penalty: float = 1.0, cache_dtype=jnp.bfloat16,
                pad_lens=None,
                early_exit: bool = True) -> Tuple[jax.Array, jax.Array,
                                                  jax.Array]:
    """Beam-search generation with per-step hidden capture.

    `early_exit` stops the on-device loop once every beam of every clip
    has emitted EOS (identical results; tested). Returns
    (best_ids (B, max_new), hidden (B, Ls+max_new, D), beam_scores (B, K)
    length-normalized). With num_beams=1 the ids match `greedy_decode`
    exactly (tested)."""
    if cache_dtype == jnp.int8:
        raise ValueError("beam search needs a reorderable KV cache; "
                         "use bf16/fp32 (int8's transposed layout would "
                         "make the per-step beam reorder a lane gather)")
    b, ls = spliced_ids.shape
    if pad_lens is None:
        pad_lens = jnp.zeros((b,), jnp.int32)
    fn = _beam_fn(model, ls, max_new_tokens, int(eos_id), int(pad_id),
                  int(num_beams), float(length_penalty), cache_dtype,
                  bool(early_exit))
    return fn(variables, spliced_ids, video_embeds, video_start,
              jnp.asarray(pad_lens, jnp.int32))
