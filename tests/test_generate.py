"""Greedy decode consistency: scan-based KV decode == full forward argmax."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.config import GroveConfig
from grove_tpu.infer.generate import generate_grounded, greedy_decode
from grove_tpu.models.grove import GroveModel, init_grove_params
from grove_tpu.text.mock_tokenizer import MockTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32, batch=1)
    return cfg, model, variables


def _prompt(cfg, rng, b=1):
    nv = cfg.num_video_tokens
    ls = nv + 6
    ids = rng.integers(3, 100, size=(b, ls)).astype(np.int32)
    ids[:, 0] = cfg.tokens.bos
    ids[:, 2:2 + nv] = 0
    video_start = np.full((b,), 2, np.int32)
    feats = rng.normal(size=(b, nv, cfg.llama.hidden_size)).astype(np.float32)
    return ids, video_start, feats


def test_greedy_matches_teacher_forced(setup, rng):
    cfg, model, variables = setup
    ids, vs, feats = _prompt(cfg, rng)
    max_new = 6
    gen_ids, hidden = greedy_decode(
        model, variables, jnp.asarray(ids), jnp.asarray(feats),
        jnp.asarray(vs), max_new_tokens=max_new, eos_id=cfg.tokens.eos,
        cache_dtype=jnp.float32)
    gen = np.asarray(gen_ids)

    # teacher-force: run the full sequence through lm_forward; argmax at each
    # generated position must reproduce the next generated token
    full = np.concatenate([ids, gen], axis=1)
    feats_pad = jnp.asarray(feats)
    hidden_tf, logits_tf = model.apply(
        variables, jnp.asarray(full), feats_pad, jnp.asarray(vs),
        method=GroveModel.lm_forward)
    logits_np = np.asarray(logits_tf)
    ls = ids.shape[1]
    stop = False
    for s in range(max_new):
        if stop:
            break
        pred = int(np.argmax(logits_np[0, ls - 1 + s]))
        assert pred == int(gen[0, s]), f"step {s}"
        if pred == cfg.tokens.eos:
            stop = True
    # hidden buffer matches the teacher-forced hidden states
    np.testing.assert_allclose(np.asarray(hidden)[0, :ls + 1],
                               np.asarray(hidden_tf)[0, :ls + 1],
                               rtol=5e-4, atol=5e-5)


def test_generate_grounded_outputs(setup, rng):
    cfg, model, variables = setup
    tok = MockTokenizer()
    ids, vs, _ = _prompt(cfg, rng)
    t = cfg.num_frames
    frames_clip = jnp.asarray(rng.normal(size=(1, t, cfg.clip.image_size,
                                               cfg.clip.image_size, 3)),
                              jnp.float32)
    frames_sam = jnp.asarray(rng.normal(size=(1, t, cfg.sam_enc.img_size,
                                              cfg.sam_enc.img_size, 3)),
                             jnp.float32)
    out = generate_grounded(model, variables, cfg, tok, ids, vs,
                            frames_clip, frames_sam, max_new_tokens=5)
    assert out["generated_ids"].shape == (1, 5)
    assert out["pred_boxes"].shape == (1, t, cfg.max_phrases, 4)
    assert out["objectness_logits"].shape == (1, t, cfg.max_phrases)
    assert isinstance(out["parsed"][0]["text"], str)


def test_ragged_batched_decode_matches_single(setup, rng):
    """Left-padded batched generation == per-sample unpadded generation."""
    import dataclasses
    from grove_tpu.infer.generate import left_pad_prompts
    cfg, model, variables = setup
    nv = cfg.num_video_tokens
    # two prompts of different lengths, shared feats per sample
    ids_a, vs_a, feats_a = _prompt(cfg, rng)
    ls_b = nv + 11
    ids_b = rng.integers(3, 100, size=(1, ls_b)).astype(np.int32)
    ids_b[:, 0] = cfg.tokens.bos
    ids_b[:, 3:3 + nv] = 0
    vs_b = np.full((1,), 3, np.int32)
    feats_b = rng.normal(size=(1, nv, cfg.llama.hidden_size)).astype(
        np.float32)

    max_new = 5
    # singles
    g_a, _ = greedy_decode(model, variables, jnp.asarray(ids_a),
                           jnp.asarray(feats_a), jnp.asarray(vs_a),
                           max_new_tokens=max_new, eos_id=cfg.tokens.eos,
                           cache_dtype=jnp.float32)
    g_b, _ = greedy_decode(model, variables, jnp.asarray(ids_b),
                           jnp.asarray(feats_b), jnp.asarray(vs_b),
                           max_new_tokens=max_new, eos_id=cfg.tokens.eos,
                           cache_dtype=jnp.float32)

    # ragged batch
    ids_p, vs_p, pad_lens = left_pad_prompts(
        [ids_a[0], ids_b[0]], [int(vs_a[0]), int(vs_b[0])],
        pad_id=cfg.tokens.pad)
    feats = np.concatenate([feats_a, feats_b], axis=0)
    g_batch, hidden = greedy_decode(
        model, variables, jnp.asarray(ids_p), jnp.asarray(feats),
        jnp.asarray(vs_p), max_new_tokens=max_new, eos_id=cfg.tokens.eos,
        cache_dtype=jnp.float32, pad_lens=pad_lens)
    gb = np.asarray(g_batch)
    assert gb[0].tolist() == np.asarray(g_a)[0].tolist()
    assert gb[1].tolist() == np.asarray(g_b)[0].tolist()


def test_early_exit_decode_matches_scan(setup, rng):
    """while_loop early-EOS decode emits exactly the fixed scan's ids, and
    hidden states agree on every step that actually ran."""
    cfg, model, variables = setup
    ids, vs, feats = _prompt(cfg, rng, b=2)
    max_new = 8
    common = dict(max_new_tokens=max_new, eos_id=cfg.tokens.eos,
                  cache_dtype=jnp.float32)
    g_scan, h_scan = greedy_decode(model, variables, jnp.asarray(ids),
                                   jnp.asarray(feats), jnp.asarray(vs),
                                   early_exit=False, **common)
    g_we, h_we = greedy_decode(model, variables, jnp.asarray(ids),
                               jnp.asarray(feats), jnp.asarray(vs),
                               early_exit=True, **common)
    assert np.asarray(g_scan).tolist() == np.asarray(g_we).tolist()
    np.testing.assert_allclose(np.asarray(h_scan), np.asarray(h_we))

    # force an early stop: declare the 3rd generated token of sample 0 to
    # be EOS; both variants must emit identical (truncated+padded) ids
    forced_eos = int(np.asarray(g_scan)[0, 2])
    g_scan2, h_scan2 = greedy_decode(model, variables, jnp.asarray(ids),
                                     jnp.asarray(feats), jnp.asarray(vs),
                                     max_new_tokens=max_new,
                                     eos_id=forced_eos,
                                     cache_dtype=jnp.float32,
                                     early_exit=False)
    g_we2, h_we2 = greedy_decode(model, variables, jnp.asarray(ids),
                                 jnp.asarray(feats), jnp.asarray(vs),
                                 max_new_tokens=max_new, eos_id=forced_eos,
                                 cache_dtype=jnp.float32, early_exit=True)
    g_scan2 = np.asarray(g_scan2)
    g_we2 = np.asarray(g_we2)
    assert g_scan2.tolist() == g_we2.tolist()
    # prefill hidden always matches; generated-step hidden matches on every
    # step executed before ALL sequences were done
    ls = ids.shape[1]
    done_at = [np.where(g_scan2[i] == 0)[0] for i in range(2)]
    n_live = max((d[0] if len(d) else max_new) for d in done_at) + 1
    n_live = min(n_live, max_new)
    np.testing.assert_allclose(np.asarray(h_scan2)[:, :ls + n_live],
                               np.asarray(h_we2)[:, :ls + n_live])


def test_sampling_decode(setup, rng):
    """Sampling loop: degenerate settings reproduce greedy; seeds are
    reproducible; different seeds can differ."""
    cfg, model, variables = setup
    ids, vs, feats = _prompt(cfg, rng, b=2)
    common = dict(max_new_tokens=6, eos_id=cfg.tokens.eos,
                  cache_dtype=jnp.float32)
    g_greedy, _ = greedy_decode(model, variables, jnp.asarray(ids),
                                jnp.asarray(feats), jnp.asarray(vs),
                                **common)
    # top_k=1 keeps only the argmax token -> identical to greedy
    g_k1, _ = greedy_decode(model, variables, jnp.asarray(ids),
                            jnp.asarray(feats), jnp.asarray(vs),
                            temperature=1.0, top_k=1, **common)
    assert np.asarray(g_k1).tolist() == np.asarray(g_greedy).tolist()
    # top_p ~ 0 keeps only the most probable token -> greedy
    g_p0, _ = greedy_decode(model, variables, jnp.asarray(ids),
                            jnp.asarray(feats), jnp.asarray(vs),
                            temperature=1.0, top_p=1e-6, **common)
    assert np.asarray(g_p0).tolist() == np.asarray(g_greedy).tolist()
    # same seed -> same sample; the loop is deterministic given the key
    key = jax.random.PRNGKey(7)
    g_a, _ = greedy_decode(model, variables, jnp.asarray(ids),
                           jnp.asarray(feats), jnp.asarray(vs),
                           temperature=5.0, rng_key=key, **common)
    g_b, _ = greedy_decode(model, variables, jnp.asarray(ids),
                           jnp.asarray(feats), jnp.asarray(vs),
                           temperature=5.0, rng_key=key, **common)
    assert np.asarray(g_a).tolist() == np.asarray(g_b).tolist()
    # a hot temperature with another seed should explore something else
    g_c, _ = greedy_decode(model, variables, jnp.asarray(ids),
                           jnp.asarray(feats), jnp.asarray(vs),
                           temperature=5.0, rng_key=jax.random.PRNGKey(8),
                           **common)
    assert (np.asarray(g_c).tolist() != np.asarray(g_a).tolist()
            or np.asarray(g_a).tolist() != np.asarray(g_greedy).tolist())


def test_encode_grounding_auto_chunks_match_direct(setup):
    """Auto-chunked SAM encode == the single-launch path bit for bit,
    and the chunk picker keeps every launch under the frame ceiling."""
    from grove_tpu.infer.jit_utils import (apply_jit,
                                           encode_grounding_auto)
    cfg, model, variables = setup
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.normal(size=(
        6, cfg.num_frames, cfg.sam_enc.img_size, cfg.sam_enc.img_size,
        3)).astype(np.float32))
    want = apply_jit(model, variables, frames, method="encode_grounding")
    got = encode_grounding_auto(model, variables, frames,
                                max_frames=2 * cfg.num_frames)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
