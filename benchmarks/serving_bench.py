"""Online-serving benchmark: batch engine vs continuous batching.

Replays a seeded Poisson arrival process of grounded-caption requests
against both serving engines on the same model + clips and reports
per-request latency (p50/p95) and makespan. The batch engine coalesces
whatever arrived inside its window into one launch (late arrivals wait
for the next full generation); the continuous engine admits requests into
a resident decode loop between ticks.

Run: python benchmarks/serving_bench.py [--model_size small] [--n 12]
        [--mean_gap_ms 150]

Full-scale mode (`--model_size full`): the 8.42B flagship serving config
(int4 LLM weights, W8A8 vision towers, synthetic weights built as zeros
directly in the serving dtypes — the full_scale.py pattern; timing is
value-independent). The batch engine runs with `pad_batches=True` so it
compiles ONE decode shape — the r2 relay wedge tracked the batch
engine's shape diversity (group sizes x prompt windows), and padding
removes it at the source.
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def run_workload(submit, clips, gaps, max_new, join_timeout=900.0):
    """Fire requests with the given inter-arrival gaps; return latencies
    (seconds, per request in arrival order) and makespan."""
    n = len(gaps)
    lat = [None] * n
    errs = []
    threads = []
    t0 = time.time()

    def fire(i):
        ts = time.time()
        try:
            submit({"video_path": clips[i % len(clips)],
                    "max_new_tokens": max_new})
            lat[i] = time.time() - ts
        except Exception as e:               # noqa: BLE001
            errs.append((i, repr(e)))

    for i in range(n):
        th = threading.Thread(target=fire, args=(i,))
        th.start()
        threads.append(th)
        time.sleep(gaps[i])
    for th in threads:
        th.join(timeout=join_timeout)
    makespan = time.time() - t0
    if errs:
        raise RuntimeError(errs)
    return np.asarray([l for l in lat if l is not None]), makespan


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_size", default="small",
                   choices=["tiny", "small", "full"])
    p.add_argument("--n", default=12, type=int)
    p.add_argument("--mean_gap_ms", default=150.0, type=float)
    p.add_argument("--max_new", default=32, type=int)
    p.add_argument("--slots", default=4, type=int)
    p.add_argument("--capacity", default=0, type=int,
                   help="continuous-engine KV rows per slot (0 = the "
                        "config default spliced_seq_len + 4*max_new = "
                        "2239 — 1.17 GB/slot bf16, too big next to the "
                        "full-scale weights; the fixed-prompt workload "
                        "here needs prompt bucket + a decode horizon)")
    p.add_argument("--engines", default="batch,continuous",
                   help="comma list: batch, continuous")
    p.add_argument("--timeout_s", default=300.0, type=float,
                   help="per-request submit timeout (raise for the cold "
                        "full-scale compile)")
    p.add_argument("--output", default=None)
    args = p.parse_args()

    import dataclasses
    import tempfile

    import jax
    import jax.numpy as jnp

    from grove_tpu.api.processor import GroveProcessor
    from grove_tpu.config import GroveConfig
    from grove_tpu.data.synthetic import make_synthetic_howto_dataset
    from grove_tpu.models.grove import init_grove_params
    from grove_tpu.serve.continuous import ContinuousService
    from grove_tpu.serve.server import BatchingEngine
    from grove_tpu.text.mock_tokenizer import MockTokenizer
    from grove_tpu.text.tokenizer import special_token_ids_from

    tok = MockTokenizer()
    if args.model_size == "full":
        # flagship serving config (BENCH_FULL_*: int4 LLM, W8A8 vision);
        # zeros directly in the serving dtypes — a real fp32 init + cast
        # peaks at double bytes through the relay and OOMs (_flagship.py)
        from _flagship import build_flagship_serving
        cfg, model, variables = build_flagship_serving(
            tokens=special_token_ids_from(tok))
    else:
        cfg = {"tiny": GroveConfig.tiny, "small": GroveConfig.small}[
            args.model_size]()
        cfg = dataclasses.replace(cfg, tokens=special_token_ids_from(tok))
        dtype = jnp.float32 if args.model_size == "tiny" else jnp.bfloat16
        model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                             dtype=dtype, batch=1)
    proc = GroveProcessor(tok, cfg)

    root = tempfile.mkdtemp(prefix="serving_bench_")
    _, vdir, _ = make_synthetic_howto_dataset(root, num_videos=4)
    clips = sorted(os.path.join(vdir, f) for f in os.listdir(vdir))

    rng = np.random.default_rng(0)
    gaps = rng.exponential(args.mean_gap_ms / 1e3, size=args.n)

    report = {"weights": "synthetic",  # no released ckpt in env
              "model_size": args.model_size, "n_requests": args.n,
              "mean_gap_ms": args.mean_gap_ms, "max_new": args.max_new,
              "slots": args.slots}

    builders = {
        # full scale pads every group to one compiled decode shape (see
        # module docstring: the r2 wedge was shape diversity)
        "batch": lambda: BatchingEngine(
            proc, model, variables, max_batch=args.slots,
            pad_batches=(args.model_size == "full")),
        "continuous": lambda: ContinuousService(
            proc, model, variables, n_slots=args.slots,
            max_new_tokens=args.max_new, capacity=args.capacity),
    }
    report["capacity"] = args.capacity or None
    report["pad_batches"] = args.model_size == "full"
    for name in args.engines.split(","):
        eng = builders[name]()
        submit = lambda payload: eng.submit(payload,  # noqa: E731
                                            timeout=args.timeout_s)
        try:
            # pass 1 warms every compiled shape the workload hits (the
            # batch engine compiles per group size, the continuous engine
            # per prompt bucket); pass 2 is the steady-state measurement
            run_workload(submit, clips, gaps, args.max_new,
                         join_timeout=args.timeout_s + 60)
            lat, makespan = run_workload(submit, clips, gaps,
                                         args.max_new,
                                         join_timeout=args.timeout_s + 60)
        finally:
            eng.close()
        report[name] = {
            "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
            "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
            "mean_ms": round(float(lat.mean()) * 1e3, 1),
            "makespan_s": round(makespan, 2),
            "rps": round(args.n / makespan, 2),
        }
        print(f"{name}: {report[name]}", flush=True)

    print(json.dumps(report))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
