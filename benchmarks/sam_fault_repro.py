"""Minimal repro for the b32 in-program-chunking SAM worker fault.

VERDICT r4 #5: b32 (`--sam_chunk 8`, 256 resident frames in one jit)
faulted the TPU worker during the SAM stage compile/warm, twice
(NOTES_ROUND4.md session 3); b24 (192 resident) runs clean. This script
isolates the SAM encoder stage alone and bisects the resident-frame
count until the fault flips, each size in its OWN subprocess so a worker
fault is contained and recorded instead of killing the sweep.

The sweep runs ASCENDING and stops at the first fault (a fault wedges
the axon relay for minutes — NOTES_ROUND4; keep probing after one and
every later size reads as a false fault). Results land in
SAM_FAULT_REPRO.json: per size {frames, chunks, status, seconds}.

Child mode (--child N): build the flagship SAM encoder (synthetic
zeros, int8 W8A8-static like the flagship serving config), run the
chunked encode at N resident frames, print OK.

Run: python benchmarks/sam_fault_repro.py [--sizes 128,192,224,256]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHUNK_FRAMES = 32   # the faulting config's chunk size (b32 / sam_chunk 8
                    # = 8 chunks of 4 clips x 8 frames)


def child(frames: int, harness: str = "single",
          ballast: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from _flagship import build_flagship_serving
    from grove_tpu.models.grove import GroveModel

    assert frames % CHUNK_FRAMES == 0, frames
    nch = frames // CHUNK_FRAMES
    cfg, model, variables = build_flagship_serving()
    params = variables["params"]
    t = cfg.num_frames
    b = frames // t

    extra = []
    if ballast:
        # the buffers full_scale.py keeps resident beside the SAM stage:
        # the CLIP frame batch + spliced ids (weights already live)
        extra.append(jax.jit(lambda: jnp.zeros(
            (b, t, cfg.clip.image_size, cfg.clip.image_size, 3),
            jnp.bfloat16))())
        extra.append(jax.jit(lambda: jnp.zeros(
            (b, cfg.num_video_tokens + 64), jnp.int32))())
        jax.block_until_ready(extra)

    def sam_fn(p, f):  # the exact full_scale.py --sam_chunk shape
        fr = f.reshape(nch, b // nch, *f.shape[1:])
        out = jax.lax.map(
            lambda ff: model.apply({"params": p}, ff,
                                   method=GroveModel.encode_grounding),
            fr)
        return out.reshape(-1, *out.shape[2:])

    fs = jnp.zeros((b, t, cfg.sam_enc.img_size, cfg.sam_enc.img_size, 3),
                   jnp.bfloat16)
    if harness == "timed":
        # the EXACT bench harness the fault occurred under: timed_loop
        # chains iters+extra invocations of the chunked stage inside
        # single jitted loop programs, carries perturbing every input
        # (full_scale.py `stage()` -> _timing.timed_loop)
        from _timing import timed_loop
        secs = timed_loop(lambda f: sam_fn(params, f), fs, iters=2,
                          repeats=3)
        print(f"child OK frames={frames} chunks={nch} harness=timed "
              f"({secs * 1e3:.0f} ms)", flush=True)
        return
    out = jax.jit(sam_fn)(params, fs)
    # scalar fetch: forces completion without the 67 MB embedding transfer
    float(out[(0,) * out.ndim])
    print(f"child OK frames={frames} chunks={nch}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--child", default=0, type=int)
    p.add_argument("--harness", default="single",
                   choices=["single", "timed"],
                   help="'timed' replicates the bench's chained "
                        "timed_loop programs (the context the fault "
                        "occurred under)")
    p.add_argument("--ballast", action="store_true",
                   help="also keep the bench's CLIP-frame/ids buffers "
                        "resident")
    p.add_argument("--sizes", default="128,192,224,256")
    p.add_argument("--timeout", default=1500, type=int,
                   help="per-size budget (cold SAM compile is minutes)")
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "SAM_FAULT_REPRO.json"))
    args = p.parse_args()
    if args.child:
        child(args.child, args.harness, args.ballast)
        return

    results = []
    for frames in [int(s) for s in args.sizes.split(",")]:
        t0 = time.time()
        try:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", str(frames), "--harness", args.harness]
            if args.ballast:
                cmd.append("--ballast")
            r = subprocess.run(
                cmd, timeout=args.timeout, capture_output=True, text=True)
            status = ("ok" if r.returncode == 0 else
                      f"fault rc={r.returncode}")
            tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        except subprocess.TimeoutExpired:
            status, tail = "hang (timeout)", []
        rec = {"frames": frames, "chunks": frames // CHUNK_FRAMES,
               "status": status, "seconds": round(time.time() - t0, 1),
               "tail": tail}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        with open(args.out, "w") as f:
            json.dump({"chunk_frames": CHUNK_FRAMES,
                       "results": results}, f, indent=1)
        if status != "ok":
            print("stopping at first fault (a fault wedges the relay; "
                  "later sizes would read as false faults)", flush=True)
            break


if __name__ == "__main__":
    main()
