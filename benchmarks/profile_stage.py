"""Per-op device-time profile of one encoder stage via jax.profiler.

jax.profiler.trace works through the axon relay (verified session 3 —
parse `<dir>/plugins/profile/*/*.trace.json.gz`, events under the pid
whose name contains "TPU"). This tool builds ONE vision tower standalone
at reference scale in its serving dtypes, runs a few profiled launches,
and prints device time aggregated per HLO op name — the table that
located the 64x dynamic-update-slice KV rewrite in minutes after rounds
of analytic probing missed it.

Run: python benchmarks/profile_stage.py --stage sam [--batch 4]
         [--vision_quant] [--static_act] [--iters 3] [--top 30]
"""

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def parse_trace(trace_dir):
    """-> dict op_name -> total device us, from the newest trace file."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU device pids from process_name metadata
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    # per-op events live on the "XLA Ops" thread; the "XLA Modules"
    # thread carries one whole-executable span that would double-count
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and "XLA Ops" in str(e.get("args", {}).get("name", ""))}
    per_op = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in tpu_pids
                and (e["pid"], e.get("tid")) in op_tids and "dur" in e):
            per_op[e.get("name", "?")] += e["dur"]
    return per_op


def parse_trace_scoped(trace_dir):
    """-> list of (op_name, dur_us, scope_str) for TPU XLA-op events.

    scope_str concatenates every string in the event's args (XLA op
    metadata: the jax name stack rides in there when present) plus the
    op name itself, so callers can bucket device time by MODULE path
    (e.g. "sam_encoder", "mask_decoder", "transpose(jvp(" for bwd) —
    not just by HLO opcode."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and "XLA Ops" in str(e.get("args", {}).get("name", ""))}
    out = []
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in tpu_pids
                and (e["pid"], e.get("tid")) in op_tids and "dur" in e):
            scope = " ".join(str(v) for v in (e.get("args") or {}).values())
            out.append((e.get("name", "?"), e["dur"],
                        scope + " " + e.get("name", "?")))
    return out


def print_table(per_op, top, total_scale=1.0):
    total = sum(per_op.values())
    print(f"\ntotal device time: {total/1e3*total_scale:.2f} ms "
          f"(x{total_scale:g} scale)")
    print(f"{'us':>10}  {'%':>5}  op")
    for name, us in per_op.most_common(top):
        print(f"{us:>10.0f}  {100*us/total:>5.1f}  {name[:90]}")
    # coarse buckets; custom-call events carry the KERNEL name, so
    # classify by HLO opcode stem and call everything unknown a kernel
    hlo_opcodes = {
        "fusion", "copy", "copy-start", "copy-done", "transpose", "dot",
        "convolution", "reduce", "reduce-window", "dynamic-update-slice",
        "dynamic-slice", "slice", "concatenate", "broadcast", "reshape",
        "bitcast", "add", "multiply", "convert", "select", "compare",
        "pad", "iota", "constant", "parameter", "tuple",
        "get-tuple-element", "all-reduce", "all-gather", "scatter",
        "gather", "rng", "exponential", "log", "tanh", "sort", "while",
        "conditional", "infeed", "outfeed", "custom-call",
    }
    buckets = collections.Counter()
    for name, us in per_op.items():
        n = name.lower()
        stem = n.split(".", 1)[0]
        if stem not in hlo_opcodes and not n.startswith("jit"):
            buckets["kernels/custom-calls"] += us
        elif stem.startswith("copy") or stem == "transpose":
            buckets["copies/transposes"] += us
        elif stem in ("convolution", "dot"):
            buckets["dots/convs"] += us
        elif stem.startswith("reduce"):
            buckets["reduces"] += us
        elif stem == "fusion":
            buckets["fusions (elementwise etc)"] += us
        elif stem in ("dynamic-update-slice", "dynamic-slice"):
            buckets["dynamic slices"] += us
        else:
            buckets["other"] += us
    print("\nbuckets:")
    for k, us in buckets.most_common():
        print(f"  {us/1e3:8.2f} ms  {100*us/total:5.1f}%  {k}")

    # grouped table: same-op instances (name.NN suffixes) summed, so a
    # 28-block tower reads as one row per op kind
    grouped = collections.Counter()
    counts = collections.Counter()
    for name, us in per_op.items():
        stem = name.rsplit(".", 1)
        base = stem[0] if len(stem) == 2 and stem[1].isdigit() else name
        grouped[base] += us
        counts[base] += 1
    print("\ngrouped (instances summed):")
    print(f"{'ms':>10}  {'%':>5}  {'n':>4}  op")
    for name, us in grouped.most_common(top):
        print(f"{us/1e3*total_scale:>10.2f}  {100*us/total:>5.1f}  "
              f"{counts[name]:>4}  {name[:80]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["sam", "clip"], required=True)
    p.add_argument("--batch", default=4, type=int)
    p.add_argument("--vision_quant", action="store_true")
    p.add_argument("--static_act", action="store_true")
    p.add_argument("--ln_kernel", action="store_true")
    p.add_argument("--iters", default=3, type=int)
    p.add_argument("--top", default=30, type=int)
    p.add_argument("--out", default="", help="also dump per-op json here")
    args = p.parse_args()

    from grove_tpu.config import ClipVisionConfig, SamEncoderConfig
    from grove_tpu.models.clip import ClipVisionTower
    from grove_tpu.models.sam_encoder import SamImageEncoder

    if args.stage == "sam":
        cfg = dataclasses.replace(
            SamEncoderConfig(), quant_w8a8=args.vision_quant,
            quant_static_act=args.static_act,
            quant_ln_kernel=args.ln_kernel)
        tower = SamImageEncoder(cfg=cfg, dtype=jnp.bfloat16)
        frames = jnp.zeros((args.batch, cfg.num_frames, cfg.img_size,
                            cfg.img_size, 3), jnp.bfloat16)
    else:
        cfg = dataclasses.replace(
            ClipVisionConfig(), quant_w8a8=args.vision_quant,
            quant_static_act=args.static_act,
            quant_ln_kernel=args.ln_kernel)
        tower = ClipVisionTower(cfg=cfg, dtype=jnp.bfloat16)
        frames = jnp.zeros((args.batch, cfg.num_frames, cfg.image_size,
                            cfg.image_size, 3), jnp.bfloat16)

    print(f"init {args.stage} tower (batch {args.batch}, "
          f"quant={args.vision_quant}, static={args.static_act})...",
          flush=True)
    shapes = jax.eval_shape(
        lambda r: tower.init(r, frames)["params"], jax.random.PRNGKey(0))
    tgt = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, jnp.bfloat16
            if a.dtype == jnp.float32 and len(a.shape) > 1 else a.dtype),
        shapes)
    params = jax.jit(lambda: jax.tree.map(
        lambda a: (jnp.ones(a.shape, a.dtype)
                   if "scale" in str(a.dtype) else
                   jnp.zeros(a.shape, a.dtype)), tgt))()
    params = jax.tree_util.tree_map_with_path(
        lambda kp, x: (jnp.ones_like(x)
                       if "act_scale" in str(kp[-1]) or
                       str(getattr(kp[-1], "key", "")) == "scale" else x),
        params)

    if args.stage == "clip":
        fn = jax.jit(lambda p, f: tower.apply({"params": p}, f)[0])
    else:
        fn = jax.jit(lambda p, f: tower.apply({"params": p}, f))
    out = fn(params, frames)
    np.asarray(jax.tree.leaves(out)[0][(0,) * out.ndim])  # compile+warm
    print("profiling...", flush=True)

    tdir = tempfile.mkdtemp(prefix=f"prof_{args.stage}_")
    with jax.profiler.trace(tdir):
        for _ in range(args.iters):
            out = fn(params, frames)
        np.asarray(out[(0,) * out.ndim])
    per_op = parse_trace(tdir)
    print_table(per_op, args.top, total_scale=1.0 / args.iters)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"stage": args.stage, "batch": args.batch,
                       "iters": args.iters,
                       "per_op_us": dict(per_op.most_common())}, f,
                      indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
