"""Host->device transfer rate + compute-overlap probe (VERDICT r4 #1).

The e2e driver prefetch thread uploads the next clip group's frames
while the device computes (`infer/drivers.py:load_group`). Whether that
actually OVERLAPS on the axon relay decides the e2e ceiling: a 16-clip
uint8 group is ~144 MB; at a serialized ~125 MB/s that is +1.15 s on
top of every ~3.5 s device pass (-25% clips/s), while a true overlap
hides it entirely.

Measures:
  1. idle H2D rate (block_until_ready'd device_put of a pinned buffer)
  2. overlapped H2D: dispatch a ~2 s chained-matmul launch, then
     device_put the same buffer while the launch runs; reports the
     put's own duration and the total wall-clock vs compute-alone.
     overlap_ratio ~ 1.0 -> the upload fully hid under compute;
     ~ (compute+put)/compute -> the relay serializes them.

Run: python benchmarks/h2d_probe.py [--mb 144] [--out H2D_PROBE.json]
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", default=144, type=int)
    p.add_argument("--out", default="")
    args = p.parse_args()

    n = args.mb * 2**20
    host = np.random.default_rng(0).integers(
        0, 255, size=(n,), dtype=np.uint8)
    report = {"mb": args.mb, "backend": jax.default_backend()}

    # compute payload ~2 s: chained bf16 matmuls inside one jit
    k = 4096

    @jax.jit
    def burn(x, iters):
        def body(_, x):
            return (x @ x) * (1.0 / k)
        return jax.lax.fori_loop(0, iters, body, x)

    import numpy as _np

    def fetch(a):                    # block_until_ready under-reports
        return float(_np.asarray(a[0, 0]))   # through the relay (SKILL)

    x0 = jnp.ones((k, k), jnp.bfloat16)
    fetch(burn(x0, 10))                       # compile
    t0 = time.time()
    fetch(burn(x0, 200))
    per = time.time() - t0
    iters = max(10, int(200 * 2.0 / per))
    t0 = time.time()
    fetch(burn(x0, iters))
    compute_s = time.time() - t0
    report["compute_alone_s"] = round(compute_s, 3)

    # 1. idle H2D (3 reps, best; completion forced by a 1-byte fetch)
    d = jax.device_put(host); _ = int(_np.asarray(d[:1])[0]); del d
    rates = []
    for _ in range(3):
        t0 = time.time()
        d = jax.device_put(host)
        _ = int(_np.asarray(d[:1])[0])
        rates.append(args.mb / (time.time() - t0))
        del d
    report["h2d_idle_mbs"] = round(max(rates), 1)

    # 2. overlapped H2D
    t0 = time.time()
    out = burn(x0, iters)                     # async dispatch
    t1 = time.time()
    d = jax.device_put(host)
    _ = int(_np.asarray(d[:1])[0])
    put_s = time.time() - t1
    fetch(out)
    total_s = time.time() - t0
    report["h2d_during_compute_s"] = round(put_s, 3)
    report["total_s"] = round(total_s, 3)
    report["overlap_ratio"] = round(total_s / compute_s, 3)
    report["verdict"] = (
        "overlapped" if total_s < compute_s + 0.3 * put_s else
        "serialized")
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
