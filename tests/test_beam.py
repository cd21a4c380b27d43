"""Beam search: k=1 equals greedy; winning-beam hidden states check out
against a teacher-forced pass (validates the per-step cache reorder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.config import GroveConfig
from grove_tpu.infer.beam import beam_decode
from grove_tpu.infer.generate import greedy_decode
from grove_tpu.models.grove import GroveModel, init_grove_params


@pytest.fixture(scope="module")
def setup():
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32, batch=1)
    return cfg, model, variables


def _prompt(cfg, rng, b=2):
    nv = cfg.num_video_tokens
    ls = nv + 6
    ids = rng.integers(3, 100, size=(b, ls)).astype(np.int32)
    ids[:, 0] = cfg.tokens.bos
    ids[:, 2:2 + nv] = 0
    vs = np.full((b,), 2, np.int32)
    feats = rng.normal(size=(b, nv, cfg.llama.hidden_size)).astype(
        np.float32)
    return ids, vs, feats


def test_beam1_matches_greedy(setup, rng):
    cfg, model, variables = setup
    ids, vs, feats = _prompt(cfg, rng)
    common = dict(max_new_tokens=6, eos_id=cfg.tokens.eos,
                  cache_dtype=jnp.float32)
    g, hg = greedy_decode(model, variables, jnp.asarray(ids),
                          jnp.asarray(feats), jnp.asarray(vs),
                          early_exit=False, **common)
    b1, hb, _ = beam_decode(model, variables, jnp.asarray(ids),
                            jnp.asarray(feats), jnp.asarray(vs),
                            num_beams=1, **common)
    assert np.asarray(g).tolist() == np.asarray(b1).tolist()
    np.testing.assert_allclose(np.asarray(hg), np.asarray(hb),
                               rtol=1e-5, atol=1e-5)


def test_beam_hidden_matches_teacher_forced(setup, rng):
    """The returned hidden states must be those of the WINNING beam —
    teacher-forcing its token sequence reproduces them. A cache-reorder
    bug would leave another beam's states behind and fail this."""
    cfg, model, variables = setup
    ids, vs, feats = _prompt(cfg, rng, b=2)
    max_new = 5
    best, hidden, scores = beam_decode(
        model, variables, jnp.asarray(ids), jnp.asarray(feats),
        jnp.asarray(vs), num_beams=3, max_new_tokens=max_new,
        eos_id=cfg.tokens.eos, cache_dtype=jnp.float32)
    best = np.asarray(best)
    full = np.concatenate([ids, best], axis=1)
    hidden_tf, _ = model.apply(variables, jnp.asarray(full),
                               jnp.asarray(feats), jnp.asarray(vs),
                               method=GroveModel.lm_forward)
    ls = ids.shape[1]
    hidden = np.asarray(hidden)
    hidden_tf = np.asarray(hidden_tf)
    for i in range(2):
        # compare hidden at each generated step that carries a real token;
        # hidden[ls + s] is produced by feeding best[s]
        for s in range(max_new):
            if best[i, s] == cfg.tokens.pad:
                break
            np.testing.assert_allclose(
                hidden[i, ls + s], hidden_tf[i, ls - 1 + s + 1],
                rtol=2e-4, atol=2e-4)


def test_beam_eos_freezes(setup, rng):
    cfg, model, variables = setup
    ids, vs, feats = _prompt(cfg, rng)
    # declare a token we know gets generated to be "EOS"
    g, _ = greedy_decode(model, variables, jnp.asarray(ids),
                         jnp.asarray(feats), jnp.asarray(vs),
                         max_new_tokens=6, eos_id=cfg.tokens.eos,
                         cache_dtype=jnp.float32)
    forced_eos = int(np.asarray(g)[0, 1])
    best, _, _ = beam_decode(model, variables, jnp.asarray(ids),
                             jnp.asarray(feats), jnp.asarray(vs),
                             num_beams=2, max_new_tokens=6,
                             eos_id=forced_eos, cache_dtype=jnp.float32)
    best = np.asarray(best)
    for i in range(best.shape[0]):
        row = best[i].tolist()
        if forced_eos in row:
            after = row[row.index(forced_eos) + 1:]
            assert all(t == cfg.tokens.pad for t in after), row


def test_beam_deterministic(setup, rng):
    cfg, model, variables = setup
    ids, vs, feats = _prompt(cfg, rng)
    kw = dict(num_beams=3, max_new_tokens=5, eos_id=cfg.tokens.eos,
              cache_dtype=jnp.float32)
    a, _, sa = beam_decode(model, variables, jnp.asarray(ids),
                           jnp.asarray(feats), jnp.asarray(vs), **kw)
    b, _, sb = beam_decode(model, variables, jnp.asarray(ids),
                           jnp.asarray(feats), jnp.asarray(vs), **kw)
    assert np.asarray(a).tolist() == np.asarray(b).tolist()
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_beam_left_padded_matches_per_sample(setup, rng):
    """Ragged prompts: left-padded batched beam search must reproduce the
    per-sample beam result (pad masking + RoPE shift under beam rows)."""
    from grove_tpu.infer.generate import left_pad_prompts

    cfg, model, variables = setup
    nv = cfg.num_video_tokens
    base = rng.integers(3, 100, size=(nv + 8,)).astype(np.int32)
    base[0] = cfg.tokens.bos
    base[2:2 + nv] = 0
    prompts = [base.tolist(), base[: nv + 5].tolist()]
    pids, pvs, plens = left_pad_prompts(prompts, [2, 2])
    feats = rng.normal(size=(2, nv, cfg.llama.hidden_size)).astype(
        np.float32)
    kw = dict(num_beams=3, max_new_tokens=4, eos_id=cfg.tokens.eos,
              cache_dtype=jnp.float32)
    gb, _, _ = beam_decode(model, variables, jnp.asarray(pids),
                           jnp.asarray(feats), jnp.asarray(pvs),
                           pad_lens=plens, **kw)
    for i, p in enumerate(prompts):
        gi, _, _ = beam_decode(model, variables,
                               jnp.asarray([p], np.int32),
                               jnp.asarray(feats[i:i + 1]),
                               jnp.asarray([2], np.int32), **kw)
        assert np.asarray(gb)[i].tolist() == np.asarray(gi)[0].tolist(), i


def test_beam_scores_are_exact_logprob_sums(setup, rng):
    """Returned beam scores must equal the teacher-forced log-prob sum of
    the returned tokens divided by their count (length_penalty=1) — the
    regression here is counting a never-recorded extra token's log-prob."""
    cfg, model, variables = setup
    ids, vs, feats = _prompt(cfg, rng, b=1)
    max_new = 4
    best, _, scores = beam_decode(
        model, variables, jnp.asarray(ids), jnp.asarray(feats),
        jnp.asarray(vs), num_beams=1, max_new_tokens=max_new,
        eos_id=cfg.tokens.eos, cache_dtype=jnp.float32)
    best = np.asarray(best)[0]
    full = np.concatenate([ids[0], best])[None]
    _, logits = model.apply(variables, jnp.asarray(full),
                            jnp.asarray(feats), jnp.asarray(vs),
                            method=GroveModel.lm_forward)
    logits = np.asarray(logits, np.float64)[0]
    ls = ids.shape[1]
    lp_sum, n = 0.0, 0
    for s, tok in enumerate(best):
        if tok == cfg.tokens.pad:
            break
        row = logits[ls - 1 + s]
        row = row - row.max()
        lp_sum += row[tok] - np.log(np.exp(row).sum())
        n += 1
    want = lp_sum / max(n, 1)
    got = float(np.asarray(scores)[0, 0])
    assert abs(got - want) < 2e-3, (got, want)


def test_beam_early_exit_matches_scan(setup, rng):
    """The while_loop early-EOS beam path must reproduce the fixed-length
    scan exactly (tokens and scores), including when beams finish early."""
    cfg, model, variables = setup
    ids, vs, feats = _prompt(cfg, rng)
    # natural EOS (may never fire) AND a forced early EOS
    g, _ = greedy_decode(model, variables, jnp.asarray(ids),
                         jnp.asarray(feats), jnp.asarray(vs),
                         max_new_tokens=6, eos_id=cfg.tokens.eos,
                         cache_dtype=jnp.float32)
    for eos in (cfg.tokens.eos, int(np.asarray(g)[0, 1])):
        kw = dict(num_beams=3, max_new_tokens=6, eos_id=eos,
                  cache_dtype=jnp.float32)
        b_scan, _, s_scan = beam_decode(model, variables, jnp.asarray(ids),
                                        jnp.asarray(feats), jnp.asarray(vs),
                                        early_exit=False, **kw)
        b_we, _, s_we = beam_decode(model, variables, jnp.asarray(ids),
                                    jnp.asarray(feats), jnp.asarray(vs),
                                    early_exit=True, **kw)
        assert np.asarray(b_scan).tolist() == np.asarray(b_we).tolist(), eos
        np.testing.assert_allclose(np.asarray(s_scan), np.asarray(s_we),
                                   rtol=1e-6)
