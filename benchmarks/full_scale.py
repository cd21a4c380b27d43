"""FULL-scale single-chip benchmark: LLaMA-7B(int8-W) + CLIP-L/336 + SAM-H/512.

Round-1 gap: the reference-scale config (8.42B params,
`train_scripts/train_howtoground.sh:4-5` / `build_sam.py:57-113`) was only
compile-checked. This RUNS it on the real chip: weight-only int8 LLM
(10.24 GB parameter bytes < 15.75 GB v5e HBM) with real launches, per-stage
times, an end-to-end clips/s number, and a roofline (achieved TF/s and GB/s
per stage vs this chip's MEASURED matmul peak and HBM bandwidth, plus the
v5e datasheet peak).

Timing discipline per the axon relay rules: iteration loops INSIDE one jit
(`lax.fori_loop`), completion forced by fetching a scalar. Weights are jit
ARGUMENTS (constants would trip the remote-compile size limit). Stage values
are zeros/synthetic — TPU timing is data-independent.

Run: python benchmarks/full_scale.py [--batch 4] [--iters 3] \
        [--output BENCH_FULL.json]
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

V5E_PEAK_TFLOPS = 197.0       # datasheet bf16
MAX_NEW_TOKENS = 64


# shared carry-chained harness (see _timing.py: the naive loop-invariant
# body gets hoisted by XLA and under-reports)
from _timing import fetch, timed_loop  # noqa: E402


def cost_of(fn, *args):
    """(flops, bytes_accessed) from XLA's cost analysis, best-effort."""
    try:
        comp = jax.jit(fn).lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def measure_peaks(iters=8):
    """Measured ceilings for the roofline: big bf16 matmul TF/s, the
    int8 matmul TOP/s (the MXU's int8 rate is ~2x bf16 — quantized
    stages must be denominated by THIS peak, or their "MFU" is
    incomparable and can exceed 1, as BENCH_r03's lm_prefill did), and
    a big-array reduction GB/s. All three are measured in the SAME
    session as the stage timings (the virtualized chip's ceilings move
    ~±5% between sessions — VERDICT r3 #7)."""
    # one 8192^3 matmul (1.1 TFLOP/iter). The earlier batched-einsum form
    # existed to amortize launch slack; slope timing in timed_loop now
    # cancels that, and the batched form invited batch-dim DCE (see
    # _timing.py). Random inputs; jnp.ones invites constant folding.
    n = 8192
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    bm = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    secs = timed_loop(lambda x, y: jnp.dot(x, y), a, bm, iters=iters,
                      repeats=3)
    peak_tf = 2 * n ** 3 / secs / 1e12

    # int8 x int8 matmul peak, in the form the serving stages use (XLA
    # dot with f32 output). The float `scale` operand exists ONLY so
    # timed_loop has a perturbable leaf: all-int8 args defeat its
    # anti-hoisting carry and the probe read 135 "TOP/s" (below bf16!);
    # with the scale it reads ~322 (i32-out: ~369 — but stages use the
    # f32-out form, so that's the honest denominator).
    ai = jnp.asarray(
        np.random.default_rng(0).integers(-127, 127, (n, n)), jnp.int8)
    bi = jnp.asarray(
        np.random.default_rng(1).integers(-127, 127, (n, n)), jnp.int8)
    secs_i8 = timed_loop(
        lambda s, x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s,
        jnp.float32(1.0), ai, bi, iters=iters, repeats=3)
    peak_tf_i8 = 2 * n ** 3 / secs_i8 / 1e12

    # 2 GiB fill, jitted (eager dispatch through the relay is pathological).
    # Bandwidth probe: an index-dependent slice start defeats loop hoisting
    # WITHOUT the full-buffer copy a carry perturbation would cost (the
    # perturbed-input pattern halves apparent BW on a pure-read kernel).
    # Slope-timed (traced bound, two iteration counts) to cancel the ~27 ms
    # relay launch overhead — see _timing.py.
    big = jax.jit(lambda: jnp.ones((1024, 1024, 1024), jnp.bfloat16))()
    rows = big.shape[0] - 1

    @jax.jit
    def bw_loop(n, x):
        def body(i, acc):
            sl = jax.lax.dynamic_slice_in_dim(x, i % 2, rows, axis=0)
            return acc + jnp.sum(sl, dtype=jnp.float32)
        return jax.lax.fori_loop(0, n, body, 0.0)

    lo, hi = 2, 2 + iters
    fetch(bw_loop(hi, big))
    # min over 3 endpoint pairs: host load inflates single reads (the
    # one-shot form read 559 GB/s under a concurrent pytest run vs ~780
    # quiet — see _timing.timed_loop's repeats note)
    t_lo = t_hi = None
    for _ in range(3):
        t0 = time.time()
        fetch(bw_loop(lo, big))
        t = time.time() - t0
        t_lo = t if t_lo is None else min(t_lo, t)
        t0 = time.time()
        fetch(bw_loop(hi, big))
        t = time.time() - t0
        t_hi = t if t_hi is None else min(t_hi, t)
    secs_r = (t_hi - t_lo) / (hi - lo)
    if secs_r <= 0:
        secs_r = t_hi / hi
    peak_gbs = big.nbytes * (rows / big.shape[0]) / secs_r / 1e9
    del big
    return peak_tf, peak_tf_i8, peak_gbs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=4, type=int)
    p.add_argument("--iters", default=3, type=int)
    p.add_argument("--decode_iters", default=16, type=int,
                   help="chained decode steps inside one jit")
    p.add_argument("--stage_repeats", default=3, type=int,
                   help="independent slope measurements per stage "
                        "(min is the headline; all runs recorded)")
    p.add_argument("--output", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_FULL.json"))
    p.add_argument("--int4", action="store_true",
                   help="group-128 int4 LLM projection weights (int8 "
                        "lm_head) instead of int8: halves decode's "
                        "weight-read bytes again")
    p.add_argument("--no_quant", action="store_true",
                   help="bf16 LLM weights (needs >15.75GB; multi-chip only)")
    p.add_argument("--fused", action="store_true",
                   help="fused qkv/gate_up projections (models/fuse.py)")
    p.add_argument("--vision_quant", action="store_true",
                   help="W8A8 int8 CLIP + SAM towers (int8 weights AND "
                        "dynamic int8 activations: the towers are "
                        "compute-bound and int8 MXU dots run 2x bf16)")
    p.add_argument("--static_act", action="store_true",
                   help="calibrated static per-tensor activation scales "
                        "for the vision towers (with --vision_quant): "
                        "removes the per-site dynamic absmax reduce")
    p.add_argument("--llm_act_quant", action="store_true",
                   help="W8A8 LLM on top of the int8 weights (dynamic "
                        "per-token activation quant; speeds the "
                        "compute-bound prefill, decode unchanged)")
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 KV cache (fused Pallas decode kernel): "
                        "halves cache bytes so batch 8 fits one chip")
    p.add_argument("--ln_kernel", action="store_true",
                   help="one-pass Pallas LN->int8 at the static vision quant sites")
    p.add_argument("--sam_chunk", default=0, type=int,
                   help="encode SAM frames in N sequential chunks "
                        "(lax.map) — halves peak activation memory at "
                        "batch 8 where all 64 frames at once OOM")
    p.add_argument("--sam_split", default=0, type=int,
                   help="run SAM encode as N separate device launches of "
                        "batch/N clips each (buffers free between "
                        "launches, unlike --sam_chunk's in-program scan "
                        "whose whole workspace must coexist) — the "
                        "production schedule for batches whose single-"
                        "shot SAM OOMs beside the weights; the stage "
                        "time is the measured wall time of all N "
                        "launches back-to-back")
    p.add_argument("--only", default="all", choices=["all", "decode"],
                   help="'decode': skip encoder/prefill stages (isolated "
                        "decode measurement at batches whose encoder "
                        "activations don't fit alongside)")
    args = p.parse_args()

    # Measured-safe ceiling for frames resident in ONE SAM jit: 192
    # (b24) runs clean; 256 (b32 --sam_chunk 8) faults the TPU worker
    # during compile/warm, reproducibly (NOTES_ROUND4 session 3;
    # benchmarks/sam_fault_repro.py isolates it). Chunking via lax.map
    # does NOT reduce residency — the whole frame batch is one jit
    # input — so refuse BEFORE touching the device and route larger
    # batches to --sam_split (separate launches, buffers freed between).
    SAM_RESIDENT_FRAMES_MAX = 192
    if args.sam_chunk > 1 and args.batch * 8 > SAM_RESIDENT_FRAMES_MAX:
        p.error(f"--sam_chunk with batch {args.batch} keeps "
                f"{args.batch * 8} frames resident in one SAM jit; "
                f"> {SAM_RESIDENT_FRAMES_MAX} reproducibly faults the "
                f"TPU worker (benchmarks/sam_fault_repro.py). "
                f"Use --sam_split.")

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import GroveModel, init_grove_params
    from grove_tpu.models.llama import init_kv_caches

    report = {"weights": "synthetic",  # no released ckpt in env
              "config": "full", "backend": jax.default_backend(),
              "iters": args.iters, "stage_repeats": args.stage_repeats,
              "batch": args.batch,
              "llm_weights": ("bf16" if args.no_quant
                              else "int4" if args.int4 else "int8")}

    print("measuring chip ceilings...", flush=True)
    peak_tf, peak_tf_i8, peak_gbs = measure_peaks()
    report["measured_peak_tflops_bf16"] = round(peak_tf, 2)
    report["measured_peak_tops_int8"] = round(peak_tf_i8, 2)
    report["measured_peak_hbm_gbs"] = round(peak_gbs, 1)
    print(f"  matmul {peak_tf:.1f} TF/s bf16 / {peak_tf_i8:.1f} TOP/s "
          f"int8, reduce {peak_gbs:.0f} GB/s", flush=True)

    cfg = GroveConfig()
    cfg = dataclasses.replace(cfg, llama=dataclasses.replace(
        cfg.llama, weight_quant=not args.no_quant, fused_qkv=args.fused,
        act_quant=args.llm_act_quant,
        weight_quant_bits=4 if args.int4 else 8))
    if args.vision_quant:
        cfg = dataclasses.replace(
            cfg,
            clip=dataclasses.replace(cfg.clip, quant_w8a8=True,
                                     quant_static_act=args.static_act,
                                     quant_ln_kernel=args.ln_kernel),
            sam_enc=dataclasses.replace(cfg.sam_enc, quant_w8a8=True,
                                        quant_static_act=args.static_act,
                                        quant_ln_kernel=args.ln_kernel))
    report["fused_qkv"] = args.fused
    report["vision"] = ("int8_w8a8_static" if args.vision_quant
                        and args.static_act
                        else "int8_w8a8" if args.vision_quant else "bf16")
    b = args.batch
    t = cfg.num_frames
    nv = cfg.num_video_tokens
    L = nv + 48

    print(f"initializing full model on device (batch {b})...", flush=True)
    t0 = time.time()
    # Build the tree as ZEROS in the serving dtypes (fp32 matrices ->
    # bf16; 1-D norm weights/scales stay fp32). A real fp32 init followed
    # by a cast peaks at fp32+bf16 bytes on the chip (donation through the
    # relay does not reliably free the source) and OOMs; zeros allocate
    # exactly the final 10.24 GB, and TPU timing is value-independent.
    shapes = jax.eval_shape(
        lambda r: init_grove_params(cfg, r, dtype=jnp.bfloat16,
                                    batch=1)[1]["params"],
        jax.random.PRNGKey(0))
    tgt = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, jnp.bfloat16
            if a.dtype == jnp.float32 and len(a.shape) > 1 else a.dtype),
        shapes)
    params = jax.jit(lambda: jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype), tgt))()
    if args.vision_quant and args.static_act:
        # calibrated scales are 1.0 here (synthetic weights; a zero
        # act_scale would divide by zero — timing is data-independent
        # but keep the arithmetic finite)
        params = jax.tree_util.tree_map_with_path(
            lambda kp, x: (jnp.ones_like(x)
                           if "act_scale" in str(kp[-1]) else x), params)
    model = GroveModel(cfg, dtype=jnp.bfloat16)
    # int4 weights are packed two-per-int8-byte (`ops.quant.pack_int4`),
    # so plain itemsize accounting is already HBM-exact
    pbytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                 for x in jax.tree.leaves(params))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params))
    report["params_b"] = round(n_params / 1e9, 2)
    report["param_bytes_gb"] = round(pbytes / 1e9, 2)
    # device-side truth: int4's packed-in-HBM claim is verified here (the
    # logical 0.5 B/elem above must match live bytes_in_use to ~1%)
    stats = jax.devices()[0].memory_stats() or {}
    if "bytes_in_use" in stats:
        report["hbm_bytes_in_use_gb"] = round(
            stats["bytes_in_use"] / 1e9, 2)
    print(f"  {n_params/1e9:.2f}B params, {pbytes/1e9:.2f} GB on chip "
          f"({time.time()-t0:.0f}s)", flush=True)

    rng = np.random.default_rng(0)
    fc = jnp.zeros((b, t, cfg.clip.image_size, cfg.clip.image_size, 3),
                   jnp.bfloat16)
    fs = jnp.zeros((b, t, cfg.sam_enc.img_size, cfg.sam_enc.img_size, 3),
                   jnp.bfloat16)
    ids = rng.integers(3, cfg.llama.vocab_size, size=(b, L)).astype(np.int32)
    ids[:, 2:2 + nv] = 0
    ids[:, -2] = cfg.tokens.det
    ids_j = jnp.asarray(ids)
    vs = jnp.full((b,), 2, jnp.int32)
    ve = jnp.zeros((b, nv, cfg.llama.hidden_size), jnp.bfloat16)
    det = jnp.full((b, cfg.max_phrases), L - 3, jnp.int32)

    stages = {}
    roofline = {}

    def stage(name, fn, *fargs, iters=None, int8=False):
        # >=3 independent slope measurements per stage: the chip's
        # run-to-run variance is ~±3-5% (VERDICT r3 #7), so a single
        # number can't distinguish a real cross-round delta from noise.
        # Headline = min (noise only ever inflates a wall-clock read).
        runs = [timed_loop(fn, *fargs, iters=iters or args.iters)
                for _ in range(args.stage_repeats)]
        secs = min(runs)
        flops, bts = cost_of(fn, *fargs)
        stages[name] = round(secs * 1e3, 2)
        entry = {"ms": round(secs * 1e3, 2),
                 "ms_runs": [round(r * 1e3, 2) for r in runs],
                 "ms_mean": round(sum(runs) / len(runs) * 1e3, 2)}
        # denominate by the peak that matches the stage's dot dtype:
        # int8 stages against the measured int8 MXU peak (2x bf16), so
        # no stage prints an "MFU" above 1 and efficiencies compare
        peak_for_stage = peak_tf_i8 if int8 else peak_tf
        if flops:
            entry["tflops_per_s"] = round(flops / secs / 1e12, 2)
            entry["dot_dtype"] = "int8" if int8 else "bf16"
            entry["mfu_vs_measured"] = round(
                flops / secs / 1e12 / peak_for_stage, 3)
            entry["mfu_vs_v5e"] = round(
                flops / secs / 1e12 /
                (V5E_PEAK_TFLOPS * (2 if int8 else 1)), 3)
        if bts:
            entry["hbm_gbs"] = round(bts / secs / 1e9, 1)
            entry["hbm_frac_of_peak"] = round(bts / secs / 1e9 / peak_gbs, 3)
        if flops and bts:
            # machine balance ~ peak*1e3/peak_gbs flops-per-byte
            entry["bound"] = ("compute" if flops / max(bts, 1.0)
                              > peak_for_stage * 1e3 / peak_gbs
                              else "memory")
        roofline[name] = entry
        print(f"  {name}: {entry}", flush=True)
        return secs

    print("timing stages...", flush=True)
    s_clip = s_sam = s_prefill = s_ground = 0.0
    if args.sam_chunk > 1:
        nch = args.sam_chunk
        assert b % nch == 0, (b, nch)

        def sam_fn(p, f):
            fr = f.reshape(nch, b // nch, *f.shape[1:])
            out = jax.lax.map(
                lambda ff: model.apply({"params": p}, ff,
                                       method=GroveModel.encode_grounding),
                fr)
            return out.reshape(-1, *out.shape[2:])
    else:
        def sam_fn(p, f):
            return model.apply({"params": p}, f,
                               method=GroveModel.encode_grounding)
    if args.only != "decode":
        # SAM first: it has the largest activation workspace, and running
        # it into a fresh heap avoids the fragmentation OOM that the
        # post-clip ordering hits at batch 8
        if args.sam_split > 1:
            ns = args.sam_split
            assert b % ns == 0, (b, ns)
            assert args.sam_chunk <= 1, "--sam_split excludes --sam_chunk"
            fs_part = fs[:b // ns]
            sam_jit = jax.jit(sam_fn)
            fetch(sam_jit(params, fs_part))            # compile + warm
            t0 = time.time()
            outs = [sam_jit(params, fs_part) for _ in range(ns)]
            for o in outs:                             # all launches queued
                # force completion via a scalar: fetching the full 67 MB
                # embedding pays ~65 ms of relay transfer per launch that
                # production (embeddings stay on device) never pays
                fetch(o[(0,) * o.ndim])
            s_sam = time.time() - t0
            stages["sam_encode"] = round(s_sam * 1e3, 2)
            roofline["sam_encode"] = {
                "ms": round(s_sam * 1e3, 2),
                "method": f"{ns} launches of batch {b // ns}, wall time "
                          "(CAUTION: includes the dev relay's per-launch "
                          "marshaling of the ~1000-leaf param tree, "
                          "~5 s/launch — production schedulers keep "
                          "params resident; prefer --sam_chunk numbers)",
            }
            print(f"  sam_encode ({ns}x batch {b // ns} launches): "
                  f"{s_sam*1e3:.1f} ms", flush=True)
        else:
            s_sam = stage("sam_encode", sam_fn, params, fs,
                          int8=args.vision_quant)
        s_clip = stage(
            "clip_encode",
            lambda p, f: model.apply({"params": p}, f,
                                     method=GroveModel.encode_video)[0],
            params, fc, int8=args.vision_quant)
        s_prefill = stage(
            "lm_prefill",
            lambda p, i, v, s: model.apply({"params": p}, i, v, s,
                                           method=GroveModel.lm_forward)[1],
            params, ids_j, ve, vs, int8=args.llm_act_quant)

        hidden = jnp.zeros((b, L, cfg.llama.hidden_size), jnp.bfloat16)
        g2 = cfg.sam_enc.grid ** 2
        ie = jnp.zeros((b * t, g2, cfg.sam_dec.embed_dim), jnp.bfloat16)
        s_ground = stage(
            "ground",
            lambda p, h, d, e: model.apply({"params": p}, h, d, e,
                                           method=GroveModel.ground)[0],
            params, hidden, det, ie)

    # chained decode: real token->token dependency inside one jit
    kv_dtype = jnp.int8 if args.kv_int8 else jnp.bfloat16
    report["kv_cache"] = "int8" if args.kv_int8 else "bf16"
    caches = init_kv_caches(cfg.llama, b, L + MAX_NEW_TOKENS, kv_dtype)
    tok0 = jnp.zeros((b, 1), jnp.int32)

    def decode_chain(p, tk, cc, steps):
        def body(i, carry):
            tk, cc = carry
            _, logits, cc = model.apply({"params": p}, tk, L + i, cc,
                                        method=GroveModel.decode_step)
            nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
            return nxt, cc
        return jax.lax.fori_loop(0, steps, body, (tk, cc))

    n_dec = args.decode_iters

    # slope-timed (traced step count) to cancel the relay launch
    # overhead. The caches are DONATED and threaded call-to-call:
    # without donation XLA prologue-copies all 64 input slabs (the DUS
    # appends may not mutate a program input) — 6 GB of HLO temps that
    # OOM the b32 decode chain by 43 MB. The copies cancel out of the
    # slope timing either way; donation removes them from the footprint.
    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_bench(p, tk, cc, n):
        return decode_chain(p, tk, cc, n)

    lo, hi = 4, 4 + n_dec
    out, caches = decode_bench(params, tok0, caches, hi)
    fetch(out)
    dec_runs = []
    for _ in range(args.stage_repeats):
        t0 = time.time()
        out, caches = decode_bench(params, tok0, caches, lo)
        fetch(out)
        t_lo = time.time() - t0
        t0 = time.time()
        out, caches = decode_bench(params, tok0, caches, hi)
        fetch(out)
        t_hi = time.time() - t0
        s = (t_hi - t_lo) / n_dec
        if s <= 0:
            s = t_hi / hi
        dec_runs.append(s)
    s_decode_step = min(dec_runs)
    stages["decode_step"] = round(s_decode_step * 1e3, 2)
    dec_flops, dec_bytes = cost_of(
        lambda p, tk, cc: model.apply({"params": p}, tk, L, cc,
                                      method=GroveModel.decode_step)[1],
        params, tok0, caches)
    # analytic decode traffic (cost_analysis overcounts fused HLO buffer
    # traffic): LLM weight bytes read once per step + KV cache read
    llm_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for path, x in jax.tree_util.tree_flatten_with_path(params)[0]
        if "llama" in jax.tree_util.keystr(path)
        or "lm_head" in jax.tree_util.keystr(path))
    cache_bytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                      for x in jax.tree.leaves(caches))
    cache_read = cache_bytes * L / (L + MAX_NEW_TOKENS)   # valid prefix
    analytic = llm_bytes + cache_read
    entry = {"ms": round(s_decode_step * 1e3, 2),
             "ms_runs": [round(r * 1e3, 2) for r in dec_runs],
             "ms_mean": round(sum(dec_runs) / len(dec_runs) * 1e3, 2),
             "analytic_bytes_gb": round(analytic / 1e9, 2),
             "analytic_hbm_gbs": round(analytic / s_decode_step / 1e9, 1),
             "bound": "memory"}
    if dec_bytes:
        entry["xla_bytes_gbs"] = round(dec_bytes / s_decode_step / 1e9, 1)
    roofline["decode_step"] = entry
    print(f"  decode_step (chained x{n_dec}): {entry}", flush=True)

    report["stages_ms"] = stages
    report["roofline"] = roofline
    report["max_new_tokens"] = MAX_NEW_TOKENS
    if args.only != "decode":
        # e2e clip time = encoders + prefill + 64 decode steps + ground
        e2e = (s_clip + s_sam + s_prefill + s_ground
               + MAX_NEW_TOKENS * s_decode_step)
        report["e2e_sec_per_batch"] = round(e2e, 3)
        report["clips_per_sec"] = round(b / e2e, 3)
        report["decode_share"] = round(
            MAX_NEW_TOKENS * s_decode_step / e2e, 3)

    print(json.dumps(report))
    with open(args.output, "w") as f:
        json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
