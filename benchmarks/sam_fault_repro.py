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


def child(frames: int) -> None:
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

    def sam_fn(p, f):  # the exact full_scale.py --sam_chunk shape
        fr = f.reshape(nch, b // nch, *f.shape[1:])
        out = jax.lax.map(
            lambda ff: model.apply({"params": p}, ff,
                                   method=GroveModel.encode_grounding),
            fr)
        return out.reshape(-1, *out.shape[2:])

    fs = jnp.zeros((b, t, cfg.sam_enc.img_size, cfg.sam_enc.img_size, 3),
                   jnp.bfloat16)
    out = jax.jit(sam_fn)(params, fs)
    # scalar fetch: forces completion without the 67 MB embedding transfer
    float(out[(0,) * out.ndim])
    print(f"child OK frames={frames} chunks={nch}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--child", default=0, type=int)
    p.add_argument("--sizes", default="128,192,224,256")
    p.add_argument("--timeout", default=1500, type=int,
                   help="per-size budget (cold SAM compile is minutes)")
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "SAM_FAULT_REPRO.json"))
    args = p.parse_args()
    if args.child:
        child(args.child)
        return

    results = []
    for frames in [int(s) for s in args.sizes.split(",")]:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", str(frames)],
                timeout=args.timeout, capture_output=True, text=True)
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
