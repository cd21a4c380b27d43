"""Ingest-INCLUSIVE end-to-end inference benchmark (VERDICT r3 #8).

Every BENCH_FULL_* clips/s number sums device stages only; the reference
metric is end-to-end — `infer_iground.py:320-435` decodes ALL clip
frames at eval fps on the host, preprocesses them (resize to the CLIP
and SAM grids), and only then launches the model. This benchmark runs
the REAL driver path at flagship scale:

    FullClipIGroundDataset (native libav decoder -> preprocess_frames)
      -> run_inference (ThreadPoolExecutor prefetch of the next clip
         group while the device computes)
      -> infer_clips_batched (batched center-window generation +
         grounding passes, int8 KV decode)

and reports wall-clock clips/s INCLUDING host ingest, next to:
  * the pure-host rate (decode+preprocess only, no device), and
  * the device-only stage-sum rate (BENCH_FULL_* methodology)
so the report shows whether host decode hides under device compute.

Synthetic clips are generated at a stated resolution/length (default
640x360, one 8-frame window at 5 fps — the same per-clip device work as
the BENCH_FULL_* stage accounting, so the two clips/s columns are
comparable). Weights are synthetic zeros (timing is value-independent).

The report carries a per-group GAP TABLE (VERDICT r4 #1): `wait_s` is
the launch thread's stall on the prefetch future (host decode + upload
that did NOT hide under device compute), `model_s` the batched
generate + postprocess, and the prefetch thread's own `load_s` /
`upload_s` durations — so e2e_s - device-stage-sum is attributed, not
guessed.

Run: python benchmarks/e2e_ingest.py [--clips 48] [--clip_batch 24]
        [--width 640] [--height 360] [--output BENCH_E2E_r05.json]
        [--profile_dir DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

from _flagship import build_flagship_serving, param_stats  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips", default=48, type=int)
    p.add_argument("--clip_batch", default=24, type=int)
    p.add_argument("--preprocess", default="yuv",
                   choices=["yuv", "rgb", "host"],
                   help="where frame geometry runs and what crosses the "
                        "relay (~27 MB/s, H2D_PROBE.json): 'yuv' ships "
                        "the stream's native 4:2:0 planes (2.8 MB/clip), "
                        "'rgb' one raw RGB copy (5.5), 'host' the two "
                        "host-resized uint8 copies (9.0)")
    p.add_argument("--profile_dir", default="",
                   help="trace the timed pass into this dir")
    p.add_argument("--frames", default=8, type=int,
                   help="frames per clip at 5 fps (8 = one model window: "
                        "matches the BENCH_FULL_* per-clip device work)")
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--height", default=360, type=int)
    p.add_argument("--max_new_tokens", default=64, type=int)
    p.add_argument("--output", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_E2E_r05.json"))
    args = p.parse_args()

    # integrated headroom: the full driver path holds decode KV (2.84 GB
    # at b16) next to the 5.77 GB weights; 128-frame SAM launches OOM
    # against that, 64-frame chunks fit (NOTES_ROUND5 bisection)
    os.environ.setdefault("GROVE_SAM_MAX_FRAMES", "64")

    import tempfile

    from grove_tpu.api.processor import _decode_kwargs
    from grove_tpu.data.synthetic import make_synthetic_howto_dataset
    from grove_tpu.infer.drivers import FullClipIGroundDataset, run_inference
    from grove_tpu.text.mock_tokenizer import MockTokenizer
    from grove_tpu.text.tokenizer import special_token_ids_from

    tok = MockTokenizer()

    print(f"generating {args.clips} synthetic clips "
          f"({args.width}x{args.height}, {args.frames} frames @5fps)...",
          flush=True)
    t0 = time.time()
    root = tempfile.mkdtemp(prefix="e2e_ingest_")
    ann_dir, video_dir, _ = make_synthetic_howto_dataset(
        root, num_videos=args.clips, num_frames=args.frames,
        width=args.width, height=args.height, fps=5.0)
    gen_s = time.time() - t0
    print(f"  generated in {gen_s:.0f}s", flush=True)

    print("building flagship serving model (synthetic zeros)...",
          flush=True)
    t0 = time.time()
    cfg, model, variables = build_flagship_serving(
        tokens=special_token_ids_from(tok))
    report = {"weights": "synthetic", "config": "full",
              "backend": jax.default_backend(),
              "llm_weights": "int4", "vision": "int8_w8a8_static",
              "kv_cache": "int8", "clips": args.clips,
              "clip_batch": args.clip_batch,
              "clip_frames": args.frames, "clip_fps": 5.0,
              "clip_resolution": f"{args.width}x{args.height}",
              "preprocess": {"yuv": "device(native YUV420 upload)",
                             "rgb": "device(raw RGB uint8 upload)",
                             "host": "host_uint8"}[args.preprocess],
              "max_new_tokens": args.max_new_tokens}
    report.update(param_stats(variables))
    print(f"  {report['params_b']}B params, "
          f"{report['param_bytes_gb']} GB ({time.time()-t0:.0f}s)",
          flush=True)

    dataset = FullClipIGroundDataset(
        ann_dir, video_dir, cfg,
        device_preprocess={"yuv": "yuv", "rgb": True,
                           "host": False}[args.preprocess])
    dk = _decode_kwargs("int8", True)

    # pure-host rate: decode + preprocess every clip, no device work.
    # One timed pass AFTER an untimed one (first pass pays page cache).
    for i in range(len(dataset)):
        dataset[i]
    t0 = time.time()
    for i in range(len(dataset)):
        dataset[i]
    host_s = time.time() - t0
    report["host_only_s"] = round(host_s, 2)
    report["host_only_clips_per_sec"] = round(args.clips / host_s, 2)
    print(f"host-only ingest: {host_s:.1f}s "
          f"({args.clips / host_s:.2f} clips/s)", flush=True)

    def full_pass(timed: bool = False):
        timing = [] if timed else None
        t0 = time.time()
        outs = run_inference(dataset, model, variables, cfg, tok,
                             max_new_tokens=args.max_new_tokens,
                             clip_batch=args.clip_batch,
                             decode_kwargs=dk, progress=True,
                             timing=timing)
        return time.time() - t0, outs, timing

    # pass 1 compiles every launched shape (persistent-cache warm);
    # pass 2 is the steady-state ingest-inclusive measurement
    print("pass 1 (compile + warm)...", flush=True)
    warm_s, outs, _ = full_pass()
    assert len(outs) == args.clips, (len(outs), args.clips)
    print(f"  {warm_s:.1f}s", flush=True)
    print("pass 2 (timed)...", flush=True)
    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            e2e_s, outs, timing = full_pass(timed=True)
    else:
        e2e_s, outs, timing = full_pass(timed=True)
    assert len(outs) == args.clips, (len(outs), args.clips)
    report["warm_pass_s"] = round(warm_s, 2)
    report["e2e_s"] = round(e2e_s, 2)
    report["e2e_clips_per_sec"] = round(args.clips / e2e_s, 3)
    # gap table (VERDICT r4 #1): e2e_s = sum(wait_s) + sum(model_s) up
    # to loop bookkeeping; wait_s is prefetch stall (ingest that did NOT
    # hide), model_s is generate + window passes + host postprocess.
    # load_s/upload_s are the prefetch thread's own phase durations
    # (they overlap model_s of the PREVIOUS group when hiding works).
    report["gap_table_per_group"] = [
        {k: round(v, 3) for k, v in g.items()} for g in timing]
    report["gap_summary_s"] = {
        k: round(sum(g[k] for g in timing), 2)
        for k in ("wait_s", "model_s", "load_s", "upload_s")}
    print(json.dumps(report))
    with open(args.output, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
