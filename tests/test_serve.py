"""Serving layer: HTTP round trip, dynamic micro-batching, error paths."""

import json
import threading
import urllib.request
import urllib.error

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.api.processor import GroveProcessor
from grove_tpu.config import GroveConfig
from grove_tpu.data.synthetic import _make_clip
from grove_tpu.models.grove import init_grove_params
from grove_tpu.serve import serve
from grove_tpu.text.mock_tokenizer import MockTokenizer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32, batch=1)
    proc = GroveProcessor(MockTokenizer(), cfg)
    root = tmp_path_factory.mktemp("serve")
    clips = []
    for i in range(3):
        p = str(root / f"clip{i}.gif")
        _make_clip(p, 6, 40, 32, 5.0, np.random.default_rng(i))
        clips.append(p)
    srv, engine = serve(proc, model, variables, port=0, max_batch=4,
                        batch_timeout_ms=150.0, model_name="grove-tiny")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    base = f"http://{host}:{port}"
    yield base, engine, clips
    srv.shutdown()
    engine.close()


def _post(base, payload, timeout=300):
    req = urllib.request.Request(
        f"{base}/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_healthz(server):
    base, _, _ = server
    with urllib.request.urlopen(f"{base}/healthz") as r:
        out = json.loads(r.read())
    assert out["status"] == "ok"
    assert out["model"] == "grove-tiny"


def test_generate_roundtrip(server):
    base, _, clips = server
    out = _post(base, {"video_path": clips[0], "max_new_tokens": 4})
    assert isinstance(out["text"], str)
    assert len(out["bboxes"]) == len(out["frame_indices"])
    # decode knobs flow through
    out2 = _post(base, {"video_path": clips[0], "max_new_tokens": 4,
                        "num_beams": 2})
    assert isinstance(out2["text"], str)


def test_concurrent_requests_micro_batch(server):
    """Coalescing check done deterministically at the engine level: stuff
    the queue while the batcher is busy with a first request, so the
    follow-ups are guaranteed to be drained together (HTTP-level timing
    on a loaded box can legitimately miss the batching window)."""
    base, engine, clips = server
    before_batches = engine.batches_run
    before_reqs = engine.requests_served
    results = [None] * 4
    errors = []

    def call(i):
        try:
            results[i] = engine.submit({"video_path": clips[i % 3],
                                        "max_new_tokens": 4})
        except Exception as e:                            # noqa: BLE001
            errors.append(e)

    # enqueue all four before starting threads is impossible via submit
    # (it blocks), so use 4 threads but give the batch window plenty of
    # slack relative to thread startup (engine fixture: 150 ms window,
    # thread spawn ~us)
    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert all(r is not None for r in results)
    served = engine.requests_served - before_reqs
    batches = engine.batches_run - before_batches
    assert served == 4
    # coalescing normally lands all 4 in 1-2 launches; tolerate one
    # straggler missing the window on a loaded box
    assert batches <= 3, (batches, served)


def test_error_paths(server):
    base, _, clips = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"video_path": clips[0], "kv_cache_dtype": "int4"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"video_path": "/nonexistent/clip.gif"})
    assert e.value.code in (400, 500)


def test_batcher_survives_unhashable_knobs(server):
    """A malformed knob value (list) must not kill the batcher thread."""
    base, _, clips = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"video_path": clips[0], "top_k": [1, 2],
                     "max_new_tokens": 4})
    assert e.value.code in (400, 500)
    # the server still works afterwards
    out = _post(base, {"video_path": clips[0], "max_new_tokens": 4})
    assert isinstance(out["text"], str)


def test_json_null_knob_is_default(server):
    base, _, clips = server
    ref = _post(base, {"video_path": clips[0], "max_new_tokens": 4})
    out = _post(base, {"video_path": clips[0], "max_new_tokens": 4,
                       "temperature": None, "top_p": None})
    assert out["text"] == ref["text"]


def test_bad_request_does_not_poison_batch(server):
    """A good and a bad request in the same batching window: the good one
    must still succeed (per-request isolation retry)."""
    base, _, clips = server
    results = {}

    def call(name, payload):
        try:
            results[name] = ("ok", _post(base, payload))
        except urllib.error.HTTPError as e:
            results[name] = ("err", e.code)

    threads = [
        threading.Thread(target=call, args=(
            "good", {"video_path": clips[0], "max_new_tokens": 4})),
        threading.Thread(target=call, args=(
            "bad", {"video_path": "/nonexistent.gif",
                    "max_new_tokens": 4})),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results["good"][0] == "ok", results
    assert results["bad"][0] == "err", results


def test_beams_with_int8_rejected(server):
    base, _, clips = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"video_path": clips[0], "num_beams": 2,
                     "kv_cache_dtype": "int8"})
    assert e.value.code == 400


def test_pad_batches_pads_to_max_and_trims():
    """pad_batches=True: every device launch sees exactly max_batch clips
    (one compiled decode shape), and the padded lanes never leak into
    client results."""
    from grove_tpu.serve.server import BatchingEngine, _Pending

    calls = []

    class StubProcessor:
        def generate_batch(self, model, variables, paths,
                           instructions=None, **kwargs):
            calls.append((list(paths), instructions))
            return [{"text": f"out:{p}"} for p in paths]

    engine = BatchingEngine(StubProcessor(), None, None, max_batch=4,
                            pad_batches=True)
    try:
        group = [_Pending({"video_path": "a.gif"}),
                 _Pending({"video_path": "b.gif",
                           "instruction": "describe"})]
        engine._run_group(group)
        assert len(calls) == 1
        paths, instructions = calls[0]
        # padded to max_batch by repeating the last clip (+ instruction)
        assert paths == ["a.gif", "b.gif", "b.gif", "b.gif"]
        assert instructions == [None, "describe", "describe", "describe"]
        # results trimmed back to the real requests, in order
        assert group[0].result == {"text": "out:a.gif"}
        assert group[1].result == {"text": "out:b.gif"}
        assert all(p.event.is_set() for p in group)
        # a full group is launched as-is (no padding)
        calls.clear()
        full = [_Pending({"video_path": f"{i}.gif"}) for i in range(4)]
        engine._run_group(full)
        assert len(calls[0][0]) == 4
    finally:
        engine.close()


def test_quantized_model_serves(tmp_path):
    """The --quantize_llm path at the library level: a W8-quantized model
    behind the batching engine answers /generate correctly."""
    from grove_tpu.api.model import GroveForCausalLM

    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32, batch=1)
    qlm = GroveForCausalLM(cfg, model, variables).quantize()
    proc = GroveProcessor(MockTokenizer(), cfg)
    clip = str(tmp_path / "clip.gif")
    _make_clip(clip, 6, 40, 32, 5.0, np.random.default_rng(0))
    srv, engine = serve(proc, qlm.model, qlm.variables, port=0,
                        model_name="grove-tiny-int8")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    try:
        out = _post(f"http://{host}:{port}",
                    {"video_path": clip, "max_new_tokens": 4})
        assert isinstance(out["text"], str)
        assert len(out["bboxes"]) == len(out["frame_indices"])
    finally:
        srv.shutdown()
        engine.close()
