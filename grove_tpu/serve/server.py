"""Serving layer: HTTP endpoint with dynamic micro-batching.

The reference's only "serving" story is SLURM batch inference over DDP
ranks (`infer_eval_scripts/*.sh`); this module adds an online path: a
threaded HTTP server whose requests are funneled into a single batcher
thread that groups up to `max_batch` clips (or whatever arrived within
`batch_timeout_ms`) into ONE device launch via
`GroveProcessor.generate_batch` — the left-padded lockstep decode makes
ragged per-request instructions batchable. One batcher thread means one
in-flight device program: requests queue on the host, the TPU stays fed,
and per-launch overhead amortizes across concurrent callers (same
economics as the offline bench: batch 32 saturates this chip).

Endpoints (JSON over stdlib http.server, no extra deps):
  GET  /healthz            -> {"status": "ok", "model": ...}
  POST /generate           -> {"text", "phrases", "bboxes", ...}
    body: {"video_path": ..., "instruction"?, "max_new_tokens"?,
           "temperature"?, "top_k"?, "top_p"?, "seed"?, "num_beams"?,
           "kv_cache_dtype"?, "early_stop"?}

`video_path` is a server-visible path (production deployments mount the
clip store; shipping raw video through JSON would dwarf the tensors).
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

_KNOBS = ("instruction", "max_new_tokens", "temperature", "top_k", "top_p",
          "seed", "num_beams", "kv_cache_dtype", "early_stop",
          "length_penalty", "temp_objectness_threshold")

MAX_NEW_TOKENS_CAP = 512

# `GroveProcessor.generate_batch` defaults — used to normalize knob keys so
# an explicitly-passed default (e.g. {"top_p": 1.0}) batches with the
# absent-key form (both resolve to the same compiled program).
_KNOB_DEFAULTS = {
    "max_new_tokens": 64, "temperature": 0.0, "top_k": 0, "top_p": 1.0,
    "seed": None, "num_beams": 1, "length_penalty": 1.0,
    "kv_cache_dtype": None, "early_stop": True,
    "temp_objectness_threshold": None,
}

# request-body cap: payloads are a path + a handful of scalar knobs; 1 MB
# is orders of magnitude above any legitimate request
MAX_BODY_BYTES = 1 << 20


def validate_payload(payload: Dict) -> None:
    """Reject bad requests BEFORE they reach the single batcher thread —
    an unvalidated max_new_tokens would compile an arbitrarily long decode
    scan and stall every queued client. Decode-knob combinations are
    validated by `api.processor._decode_kwargs`; this adds the
    server-boundary checks (types + the compile-cost cap)."""
    from ..api.processor import _decode_kwargs
    if "video_path" not in payload:
        raise ValueError("video_path required")
    if not isinstance(payload["video_path"], str):
        raise ValueError(f"video_path must be a string, got "
                         f"{type(payload['video_path']).__name__}")
    mnt = payload.get("max_new_tokens")
    if mnt is not None:
        if (isinstance(mnt, bool) or not isinstance(mnt, int)
                or not 1 <= mnt <= MAX_NEW_TOKENS_CAP):
            raise ValueError(f"max_new_tokens must be an int in "
                             f"[1, {MAX_NEW_TOKENS_CAP}], got {mnt!r}")
    for key, typ in (("temperature", (int, float)), ("top_k", int),
                     ("top_p", (int, float)), ("seed", int),
                     ("num_beams", int), ("length_penalty", (int, float)),
                     ("early_stop", bool), ("kv_cache_dtype", str),
                     ("instruction", str),
                     ("temp_objectness_threshold", (int, float))):
        val = payload.get(key)
        if val is None:
            continue
        # bool is a subclass of int: {"top_k": true} must not pass as 1
        if isinstance(val, bool) and typ is not bool:
            raise ValueError(f"{key} must be {typ}, got bool")
        if not isinstance(val, typ):
            raise ValueError(f"{key} must be {typ}, got {type(val).__name__}")
    # knob-combination validation (raises ValueError on bad combos);
    # JSON null means "use the default"
    def _get(key, default):
        val = payload.get(key)
        return default if val is None else val

    _decode_kwargs(payload.get("kv_cache_dtype"), _get("early_stop", True),
                   _get("temperature", 0.0), _get("top_k", 0),
                   _get("top_p", 1.0), payload.get("seed"),
                   _get("num_beams", 1), _get("length_penalty", 1.0))


def _jsonable(out: Dict) -> Dict:
    """Convert a processor output dict (numpy arrays inside) to JSON."""
    res = {}
    for k, v in out.items():
        if isinstance(v, np.ndarray):
            res[k] = v.tolist()
        elif isinstance(v, (list, tuple)):
            res[k] = [x.tolist() if isinstance(x, np.ndarray) else x
                      for x in v]
        else:
            res[k] = v
    return res


class OverloadedError(RuntimeError):
    """Raised when the request queue is full (HTTP 503)."""


class _Pending:
    __slots__ = ("payload", "event", "result", "error", "abandoned")

    def __init__(self, payload):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.abandoned = False   # set when the submitter gave up waiting


class BatchingEngine:
    """Groups concurrent /generate requests into one device launch.

    Requests are batchable together only when their decode knobs agree
    (they share one compiled program); the batcher drains the queue and
    splits it into knob-groups, largest first."""

    def __init__(self, processor, model, variables, *, max_batch: int = 8,
                 batch_timeout_ms: float = 10.0, max_queue: int = 256,
                 pad_batches: bool = False):
        self.processor = processor
        self.model = model
        self.variables = variables
        self.max_batch = max_batch
        # pad every group to max_batch by repeating the last clip (extras
        # discarded): ONE compiled decode shape instead of one per group
        # size. Decode is weight-read-bound, so the padded compute is
        # nearly free; first-request latency stops paying a fresh
        # multi-second compile per group size.
        self.pad_batches = pad_batches
        self.batch_timeout = batch_timeout_ms / 1000.0
        # bounded: a request flood must shed load (503) at the door, not
        # accumulate on the host until the submit timeout drains it
        self.queue: "queue.Queue[_Pending]" = queue.Queue(maxsize=max_queue)
        self.batches_run = 0
        self.requests_served = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, payload: Dict, timeout: float = 300.0) -> Dict:
        p = _Pending(payload)
        try:
            self.queue.put_nowait(p)
        except queue.Full:
            raise OverloadedError("server overloaded, retry later") from None
        if not p.event.wait(timeout):
            # mark so the batcher drops it instead of burning a device
            # launch on a result nobody will read
            p.abandoned = True
            raise TimeoutError("generation timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------

    def _drain(self) -> List[_Pending]:
        """Block for one request, then grab whatever else arrives within
        the batching window (up to max_batch)."""
        try:
            first = self.queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.batch_timeout
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    @staticmethod
    def _knob_key(payload: Dict) -> str:
        """Hashable grouping key; json round-trip handles any client value
        (lists/dicts included) without crashing the batcher.

        Knobs are normalized through `_KNOB_DEFAULTS` so explicit defaults
        ({"top_p": 1.0}) group with absent keys ({}) — semantically
        identical requests must not fragment into separate launches. A seed
        on a greedy request is inert (dropped by _decode_kwargs), so it is
        dropped here too."""
        vals = {}
        for k, default in _KNOB_DEFAULTS.items():
            v = payload.get(k)
            v = default if v is None else v
            # JSON clients send float knobs as ints ({"top_p": 1}):
            # coerce so they group with the float default (bools never
            # reach here — validate_payload rejects them for these keys)
            if isinstance(default, float) and isinstance(v, int):
                v = float(v)
            if v != default:
                vals[k] = v
        if not vals.get("temperature"):
            vals.pop("seed", None)
        return json.dumps(vals, sort_keys=True, default=str)

    def _loop(self):
        while not self._stop.is_set():
            batch: List[_Pending] = []
            try:
                batch = [p for p in self._drain() if not p.abandoned]
                if not batch:
                    continue
                groups: Dict[str, List[_Pending]] = {}
                for p in batch:
                    groups.setdefault(self._knob_key(p.payload), []).append(p)
                for group in sorted(groups.values(), key=len, reverse=True):
                    self._run_group(group)
            except Exception as e:                       # noqa: BLE001
                # the batcher thread must never die: fail whatever was in
                # flight and keep serving
                for p in batch:
                    if not p.event.is_set():
                        p.error = e
                        p.event.set()

    def _run_group(self, group: List[_Pending], *, isolate: bool = True):
        # re-check abandonment here too: a request can time out while
        # queued BEHIND other groups in the same drain cycle
        group = [p for p in group if not p.abandoned]
        if not group:
            return
        try:
            # JSON null == absent: clients sending {"temperature": null}
            # mean "default", not the Python value None
            kwargs = {k: group[0].payload[k] for k in _KNOBS
                      if k != "instruction"
                      and group[0].payload.get(k) is not None}
            paths = [p.payload["video_path"] for p in group]
            instructions = [p.payload.get("instruction") for p in group]
            n_real = len(paths)
            if self.pad_batches and n_real < self.max_batch:
                pad_n = self.max_batch - n_real
                paths = paths + [paths[-1]] * pad_n
                instructions = instructions + [instructions[-1]] * pad_n
            if all(i is None for i in instructions):
                instructions = None
            outs = self.processor.generate_batch(
                self.model, self.variables, paths,
                instructions=instructions, **kwargs)[:n_real]
            self.batches_run += 1
            self.requests_served += len(group)
            for p, out in zip(group, outs):
                p.result = _jsonable(out)
                p.event.set()
        except Exception as e:                           # noqa: BLE001
            if isolate and len(group) > 1:
                # don't let one bad clip poison its co-batched neighbors:
                # retry each request alone so only the culprit fails
                for p in group:
                    self._run_group([p], isolate=False)
            else:
                for p in group:
                    p.error = e
                    p.event.set()


class GroveServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, addr, engine: BatchingEngine, model_name: str):
        self.engine = engine
        self.model_name = model_name
        super().__init__(addr, _Handler)


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):                           # quiet by default
        pass

    def _send(self, code: int, obj: Dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            eng = self.server.engine
            self._send(200, {
                "status": "ok", "model": self.server.model_name,
                "batches_run": eng.batches_run,
                "requests_served": eng.requests_served,
            })
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):
        if self.path != "/generate":
            self._send(404, {"error": "not found"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            if n > MAX_BODY_BYTES:
                self._send(413, {"error": f"request body too large "
                                          f"({n} > {MAX_BODY_BYTES} bytes)"})
                return
            payload = json.loads(self.rfile.read(n) or b"{}")
            try:
                validate_payload(payload)
            except ValueError as e:
                self._send(400, {"error": str(e)})
                return
            out = self.server.engine.submit(payload)
            self._send(200, out)
        except TimeoutError as e:
            self._send(504, {"error": str(e)})
        except OverloadedError as e:
            self._send(503, {"error": str(e)})
        except FileNotFoundError as e:
            self._send(400, {"error": str(e)})
        except ValueError as e:
            self._send(400, {"error": str(e)})
        except Exception as e:                           # noqa: BLE001
            self._send(500, {"error": f"{type(e).__name__}: {e}"})


def serve(processor, model, variables, *, host: str = "127.0.0.1",
          port: int = 8470, max_batch: int = 8,
          batch_timeout_ms: float = 10.0, model_name: str = "grove_tpu",
          pad_batches: bool = False):
    """Build (server, engine); call server.serve_forever() to run."""
    engine = BatchingEngine(processor, model, variables,
                            max_batch=max_batch,
                            batch_timeout_ms=batch_timeout_ms,
                            pad_batches=pad_batches)
    server = GroveServer((host, port), engine, model_name)
    return server, engine


def main(argv: Optional[List[str]] = None):
    import argparse

    from ..api.model import GroveForCausalLM
    from ..api.processor import GroveProcessor

    p = argparse.ArgumentParser("grove_tpu.serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8470, type=int)
    p.add_argument("--model_size", default="small",
                   choices=["tiny", "small", "full"])
    p.add_argument("--version", default=None,
                   help="checkpoint: HF-layout dir / Orbax dir / torch "
                        ".bin (random init if omitted — smoke-serving)")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer path (MockTokenizer if omitted)")
    p.add_argument("--max_batch", default=8, type=int)
    p.add_argument("--batch_timeout_ms", default=10.0, type=float)
    p.add_argument("--pad_batches", action="store_true",
                   help="pad every group to max_batch (one compiled decode "
                        "shape; padded lanes are ~free on the HBM-bound "
                        "decode, and new group sizes stop paying a "
                        "multi-second first-request compile)")
    p.add_argument("--quantize_llm", action="store_true",
                   help="weight-only int8 LLM (halves LLM weight HBM; "
                        "lets the full model serve on one chip)")
    p.add_argument("--llm_bits", default=8, type=int, choices=(8, 4),
                   help="LLM weight-quant width with --quantize_llm: 8 "
                        "(per-channel int8) or 4 (group-128 int4 "
                        "projections + int8 lm_head — halves decode's "
                        "weight-read bytes again)")
    p.add_argument("--llm_act_quant", action="store_true",
                   help="dynamic int8 LLM activations with "
                        "--quantize_llm: prefill rides the int8 MXU "
                        "path (measured 257 TF/s effective at W8A8)")
    p.add_argument("--quantize_vision", action="store_true",
                   help="W8A8 int8 CLIP + SAM towers on top of "
                        "--quantize_llm (int8 MXU dots run 2x bf16 on "
                        "the compute-bound encode stages)")
    p.add_argument("--fused_qkv", action="store_true",
                   help="fuse qkv/gate_up projections (bit-identical; "
                        "fewer wider matmuls per decode step)")
    p.add_argument("--continuous", action="store_true",
                   help="continuous batching: requests join/leave one "
                        "resident decode loop (greedy-only; see "
                        "serve/continuous.py)")
    p.add_argument("--n_slots", default=4, type=int,
                   help="decode slots for --continuous")
    args = p.parse_args(argv)

    if args.tokenizer:
        from ..text.tokenizer import load_grove_tokenizer
        tok = load_grove_tokenizer(args.tokenizer)
    else:
        from ..text.mock_tokenizer import MockTokenizer
        tok = MockTokenizer()

    lm = GroveForCausalLM.from_pretrained(args.version,
                                          model_size=args.model_size,
                                          tokenizer=tok)
    if args.quantize_llm or args.quantize_vision:
        lm = lm.quantize(vision=args.quantize_vision, bits=args.llm_bits,
                         act_quant=args.llm_act_quant)
    if args.fused_qkv:
        lm = lm.fuse()
    proc = GroveProcessor(tok, lm.cfg)
    if args.continuous:
        from .continuous import ContinuousService
        engine = ContinuousService(proc, lm.model, lm.variables,
                                   n_slots=args.n_slots)
        server = GroveServer((args.host, args.port), engine,
                             f"grove-{args.model_size}-continuous")
    else:
        server, _ = serve(proc, lm.model, lm.variables, host=args.host,
                          port=args.port, max_batch=args.max_batch,
                          batch_timeout_ms=args.batch_timeout_ms,
                          model_name=f"grove-{args.model_size}",
                          pad_batches=args.pad_batches)
    print(f"serving grove-{args.model_size} on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
