"""Probe: SAM global-attention (S=1024) kernel variants + Conv3d adapter.

The 4 global blocks + 4 adapters are ~200 ms of the SAM-H stage after the
windowed-path fix. Global attention currently runs the flash relpos kernel
on a (B*H, S/bq) = 2048-cell grid — mostly per-cell overhead (same failure
mode the windowed path had). The v2 lane-sliced kernel at group=1 is a
32-cell grid; VMEM is borderline (~17 MB) so this must be measured, not
assumed. The adapter probe compares XLA Conv3d against a sum-of-27-shifted-
matmuls einsum formulation.

Run: python benchmarks/sam_global_probe.py [--frames 32]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import timed_loop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", default=32, type=int)
    p.add_argument("--grid", default=32, type=int)
    p.add_argument("--dim", default=1280, type=int)
    p.add_argument("--heads", default=16, type=int)
    p.add_argument("--iters", default=5, type=int)
    args = p.parse_args()

    bt, g, c, nh = args.frames, args.grid, args.dim, args.heads
    hd = c // nh
    s = g * g
    report = {"frames": bt, "grid": g}

    def timeit(name, fn, *fargs):
        try:
            secs = timed_loop(fn, *fargs, iters=args.iters)
        except Exception as e:                            # noqa: BLE001
            report[name] = f"FAIL: {type(e).__name__}"
            print(f"  {name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            return None
        report[name] = round(secs * 1e3, 2)
        print(f"  {name}: {secs*1e3:.2f} ms", flush=True)
        return secs

    q = jax.jit(lambda: jnp.zeros((bt, s, nh, hd), jnp.bfloat16))()
    qr = jax.jit(lambda: jnp.zeros((bt, s, c), jnp.bfloat16))()
    rel = jax.jit(lambda: jnp.zeros((2 * g - 1, hd), jnp.float32))()

    from grove_tpu.ops.sam_attention import (
        grouped_window_attention_relpos_v2, relpos_terms,
        relpos_terms_raw, sam_attention_with_relpos)

    # current dispatch: flash fwd kernel, (B*H, S/bq) grid
    timeit("global_flash_ms",
           lambda a, r: sam_attention_with_relpos(a, a, a, r, r, (g, g)),
           q, rel)

    # v2 lane-sliced kernel, group=1: 32-cell grid, heads unrolled
    def v2_global(a, r):
        rp = relpos_terms_raw(a, r, r, (g, g), nh)
        return grouped_window_attention_relpos_v2(a, a, a, rp, (g, g),
                                                  nh, group=1)
    timeit("global_v2_raw_ms", v2_global, qr, rel)

    # v1 grouped kernel at S=1024: folded (B*H, S, D) layout, one full-S
    # softmax per cell — kills the flash path's 4x kv re-read and 2048->512
    # cells; VMEM ~9 MB at group=1
    from grove_tpu.ops.sam_attention import grouped_window_attention_relpos

    for grp in (1, 2, 4):
        def v1_global(a, r, grp=grp):
            rh, rw = relpos_terms(a, r, r, (g, g))
            return grouped_window_attention_relpos(a, a, a, rh, rw, (g, g),
                                                   group=grp)
        timeit(f"global_v1_g{grp}_ms", v1_global, q, rel)

    # Conv3d adapter: XLA conv vs sum-of-shifted-matmuls
    import flax.linen as nn
    b5 = (bt // 8, 8, g, g, c)
    x5 = jax.jit(lambda: jnp.zeros(b5, jnp.bfloat16))()
    conv = nn.Conv(c, (3, 3, 3), padding="SAME", dtype=jnp.bfloat16)
    cvars = jax.jit(conv.init)(jax.random.PRNGKey(0), x5)
    timeit("adapter_conv3d_ms", lambda v, a: conv.apply(v, a), cvars, x5)

    w27 = jax.jit(lambda: jnp.zeros((27, c, c), jnp.bfloat16))()

    def conv3d_shifts(a, w):
        b, t, hh, ww, cc = a.shape
        xp = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        out = jnp.zeros((b, t, hh, ww, cc), jnp.float32)
        i = 0
        for dt_ in range(3):
            for dh in range(3):
                for dw in range(3):
                    sl = jax.lax.dynamic_slice(
                        xp, (0, dt_, dh, dw, 0), (b, t, hh, ww, cc))
                    out = out + jnp.einsum(
                        "bthwc,cd->bthwd", sl, w[i],
                        preferred_element_type=jnp.float32)
                    i += 1
        return out.astype(a.dtype)

    timeit("adapter_shifts_ms", conv3d_shifts, x5, w27)

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
