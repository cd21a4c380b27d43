"""Continuous batching engine: per-request parity with offline decode.

A slot's tokens must be IDENTICAL to an offline `greedy_decode` of the
same prompt regardless of when it joined the loop (left-pad masking makes
the extra cache columns exact zeros in the softmax), and the grounding
head must produce the same boxes from the assembled hidden states.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.config import GroveConfig
from grove_tpu.infer.generate import greedy_decode
from grove_tpu.models.grove import GroveModel, init_grove_params
from grove_tpu.serve.continuous import ContinuousEngine
from grove_tpu.text.packing import det_gather_positions

MAX_NEW = 6


@pytest.fixture(scope="module")
def setup():
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32, batch=1)
    rng = np.random.default_rng(7)
    t = cfg.num_frames
    hw = cfg.sam_enc.grid ** 2
    nv = cfg.num_video_tokens

    def make_request(lp_extra):
        lp = nv + 4 + lp_extra
        ids = rng.integers(3, 100, size=(lp,)).astype(np.int32)
        vstart = 2
        ids[vstart:vstart + nv] = 0
        ve = jnp.asarray(rng.normal(size=(1, nv, cfg.llama.hidden_size)),
                         jnp.float32)
        img = jnp.asarray(rng.normal(size=(t, hw, cfg.sam_dec.embed_dim)),
                          jnp.float32)
        return {"ids": ids, "vstart": vstart, "ve": ve, "img": img}

    reqs = [make_request(k) for k in (0, 3, 7)]
    return cfg, model, variables, reqs


def offline(cfg, model, variables, req):
    gen, hidden = greedy_decode(
        model, variables, jnp.asarray(req["ids"][None]), req["ve"],
        jnp.asarray([req["vstart"]], np.int32), max_new_tokens=MAX_NEW,
        eos_id=cfg.tokens.eos, pad_id=cfg.tokens.pad,
        cache_dtype=jnp.float32, early_exit=False)
    gen = np.asarray(gen[0])
    full = np.concatenate([req["ids"], gen])
    det_pos, _ = det_gather_positions(full, cfg.tokens.det,
                                      cfg.max_phrases)
    boxes, obj = model.apply(variables, hidden, jnp.asarray(det_pos[None]),
                             req["img"], method=GroveModel.ground)
    return gen, np.asarray(boxes[0], np.float32)


def test_staggered_admissions_match_offline(setup):
    cfg, model, variables, reqs = setup
    eng = ContinuousEngine(model, variables, cfg, n_slots=2,
                           max_new_tokens=MAX_NEW, prompt_bucket=16,
                           cache_dtype=jnp.float32)

    eng.admit(0, reqs[0]["ids"], reqs[0]["ve"], reqs[0]["vstart"],
              reqs[0]["img"])
    for _ in range(2):
        eng.tick()                      # r0 mid-decode
    eng.admit(1, reqs[1]["ids"], reqs[1]["ve"], reqs[1]["vstart"],
              reqs[1]["img"])           # joins the running loop
    finished = list(eng.run_until_idle())
    # r2 rides a later session after the rotation
    eng.admit(2, reqs[2]["ids"], reqs[2]["ve"], reqs[2]["vstart"],
              reqs[2]["img"])
    finished += eng.run_until_idle()
    assert sorted(finished) == [0, 1, 2]

    for rid, req in enumerate(reqs):
        res = eng.pop_result(rid)
        assert res is not None, rid
        ref_gen, ref_boxes = offline(cfg, model, variables, req)
        steps = res["steps"]
        np.testing.assert_array_equal(res["generated_ids"],
                                      ref_gen[:steps])
        assert np.all(ref_gen[steps:] == cfg.tokens.pad)
        np.testing.assert_allclose(res["pred_boxes"], ref_boxes,
                                   rtol=2e-4, atol=2e-5)


def test_capacity_and_free_slots(setup):
    cfg, model, variables, reqs = setup
    eng = ContinuousEngine(model, variables, cfg, n_slots=1,
                           max_new_tokens=MAX_NEW, prompt_bucket=16,
                           cache_dtype=jnp.float32)
    assert len(eng.free_slots()) == 1
    eng.admit(0, reqs[0]["ids"], reqs[0]["ve"], reqs[0]["vstart"],
              reqs[0]["img"])
    assert not eng.free_slots()
    with pytest.raises(RuntimeError):
        eng.admit(1, reqs[1]["ids"], reqs[1]["ve"], reqs[1]["vstart"],
                  reqs[1]["img"])
    eng.run_until_idle()
    assert len(eng.free_slots()) == 1


def test_continuous_service_matches_batch_engine(setup, tmp_path):
    """Full HTTP-level parity: the continuous service must produce the
    same response dict as the whole-batch engine for the same clip, with
    requests submitted concurrently from two threads."""
    import threading

    from grove_tpu.api.processor import GroveProcessor
    from grove_tpu.data.synthetic import make_synthetic_howto_dataset
    from grove_tpu.serve.continuous import ContinuousService
    from grove_tpu.serve.server import BatchingEngine
    from grove_tpu.text.mock_tokenizer import MockTokenizer

    cfg, model, variables, _ = setup
    import os
    tok = MockTokenizer()
    import dataclasses
    from grove_tpu.text.tokenizer import special_token_ids_from
    cfg2 = dataclasses.replace(cfg, tokens=special_token_ids_from(tok))
    proc = GroveProcessor(tok, cfg2)

    ann, vdir, _ = make_synthetic_howto_dataset(str(tmp_path),
                                                num_videos=2)
    clips = sorted(os.path.join(vdir, f) for f in os.listdir(vdir))

    batch = BatchingEngine(proc, model, variables)
    svc = ContinuousService(proc, model, variables, n_slots=2,
                            max_new_tokens=MAX_NEW, prompt_bucket=16)
    try:
        want = [batch.submit({"video_path": c, "max_new_tokens": MAX_NEW})
                for c in clips]

        got = [None, None]
        def run(i):
            got[i] = svc.submit({"video_path": clips[i],
                                 "max_new_tokens": MAX_NEW})
        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        for w, g in zip(want, got):
            assert g is not None
            assert g["text"] == w["text"]
            np.testing.assert_allclose(np.asarray(g["bboxes"], object).size
                                       and np.concatenate(
                                           [np.asarray(x, np.float32)
                                            .reshape(-1) for x in g["bboxes"]])
                                       or np.zeros(0),
                                       np.asarray(w["bboxes"], object).size
                                       and np.concatenate(
                                           [np.asarray(x, np.float32)
                                            .reshape(-1) for x in w["bboxes"]])
                                       or np.zeros(0), rtol=2e-3, atol=2e-3)

        with pytest.raises(ValueError):
            svc.submit({"video_path": clips[0], "temperature": 0.7})
    finally:
        svc.close()
        batch.close()


def test_custom_capacity_matches_offline(setup):
    """A tight custom capacity (full-scale serving sizes the KV to the
    actual prompt bucket + decode horizon instead of the 2239-row
    default — NOTES_ROUND5 OOM) keeps tokens bit-identical to offline:
    the column pointer starts at capacity - 4*max_new."""
    cfg, model, variables, reqs = setup
    cap = 32 + 4 * MAX_NEW                 # prompt bucket + horizon
    eng = ContinuousEngine(model, variables, cfg, n_slots=2,
                           max_new_tokens=MAX_NEW, prompt_bucket=16,
                           cache_dtype=jnp.float32, capacity=cap)
    assert eng.capacity == cap and eng.col == cap - 4 * MAX_NEW
    for rid, req in enumerate(reqs):
        if not eng.free_slots():
            eng.run_until_idle()
        eng.admit(rid, req["ids"], req["ve"], req["vstart"], req["img"])
    eng.run_until_idle()
    for rid, req in enumerate(reqs):
        res = eng.pop_result(rid)
        assert res is not None, rid
        ref_gen, ref_boxes = offline(cfg, model, variables, req)
        steps = res["steps"]
        np.testing.assert_array_equal(res["generated_ids"],
                                      ref_gen[:steps])
        np.testing.assert_allclose(res["pred_boxes"], ref_boxes,
                                   rtol=2e-4, atol=2e-5)
