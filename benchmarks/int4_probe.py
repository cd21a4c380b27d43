"""Probe: int4 weights on this chip — packing, decode dots, kernels.

Questions this answers (each gates the int4 serving mode's value):
  1. Does the TPU store jnp.int4 PACKED in HBM (2 elem/byte)? Checked
     via live device memory_stats around a 512 MB-logical allocation.
  2. Does XLA fuse the int4->bf16 convert into a decode-shaped dot's
     operand read (as it provably does for int8), i.e. does the grouped
     einsum decode path ride at int4 byte rate?
  3. Fused Pallas kernels: W4A16 (`int4_matmul`) and W4A8
     (`int4_matmul_a8`) at prefill shapes vs the bf16/int8 XLA baseline.

Run: python benchmarks/int4_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import fetch, timed_loop


def mem_used():
    stats = jax.devices()[0].memory_stats() or {}
    return stats.get("bytes_in_use", 0)


def main():
    report = {"backend": jax.default_backend()}
    k, n = 4096, 11008

    # --- 1. packing ---
    base = mem_used()
    w4 = jax.jit(lambda: jnp.zeros((k, n * 8), jnp.int4))()
    fetch(w4[0, 0].astype(jnp.int8))
    used = mem_used() - base
    logical = k * n * 8 // 2
    report["int4_alloc_logical_mb"] = round(logical / 1e6, 1)
    report["int4_alloc_device_mb"] = round(used / 1e6, 1)
    report["int4_packed"] = bool(used < 1.5 * logical)
    print(f"int4 packed in HBM: {report['int4_packed']} "
          f"(logical {logical/1e6:.0f} MB, device {used/1e6:.0f} MB)",
          flush=True)
    del w4

    # --- 2. decode-shaped dots (weight-read-bound): b rows x (K, N) ---
    b = 8
    x = jax.jit(lambda: jnp.zeros((b, k), jnp.bfloat16))()
    wbf = jax.jit(lambda: jnp.zeros((k, n), jnp.bfloat16))()
    w8 = jax.jit(lambda: jnp.zeros((k, n), jnp.int8))()
    s8 = jax.jit(lambda: jnp.zeros((n,), jnp.float32))()
    w4 = jax.jit(lambda: jnp.zeros((k, n), jnp.int4))()
    g = 128
    s4 = jax.jit(lambda: jnp.zeros((k // g, n), jnp.float32))()

    def dot_bf16(x, w):
        return x @ w

    def dot_w8(x, w, s):
        return (x @ w.astype(x.dtype)) * s.astype(x.dtype)

    def dot_w4_grouped(x, w, s):
        xg = x.reshape(b, k // g, g)
        wg = w.reshape(k // g, g, n)
        y = jnp.einsum("bgk,gkn->bgn", xg, wg.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return (y * s).sum(axis=-2).astype(x.dtype)

    for name, fn, args in [
            ("decode_dot_bf16_ms", dot_bf16, (x, wbf)),
            ("decode_dot_int8_ms", dot_w8, (x, w8, s8)),
            ("decode_dot_int4_grouped_ms", dot_w4_grouped, (x, w4, s4))]:
        secs = timed_loop(fn, *args, iters=3)
        report[name] = round(secs * 1e3, 3)
        print(f"  {name}: {secs*1e3:.3f} ms", flush=True)

    # byte-rate interpretation: weight bytes / time
    for nm, bts in [("bf16", k * n * 2), ("int8", k * n),
                    ("int4_grouped", k * n // 2 + (k // g) * n * 4)]:
        key = f"decode_dot_{nm}_ms"
        if key in report and report[key] > 0:
            report[f"decode_dot_{nm}_gbs"] = round(
                bts / (report[key] / 1e3) / 1e9, 1)

    # --- 3. prefill shapes: fused kernels vs XLA ---
    m = 2752                      # batch 4 x 688 tokens
    xp = jax.jit(lambda: jnp.zeros((m, k), jnp.bfloat16))()
    from grove_tpu.ops.int4_matmul import int4_matmul, int4_matmul_a8
    from grove_tpu.models.layers import quant_act

    def prefill_bf16(x, w):
        return x @ w

    def prefill_w8a8(x, w, s):
        xq, sx = quant_act(x)
        y = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * sx * s).astype(x.dtype)

    def prefill_w4a16(x, w, s):
        return int4_matmul(x, w, s)

    def prefill_w4a8(x, w, s):
        xq, sx = quant_act(x)
        return int4_matmul_a8(xq, sx, w, s)

    for name, fn, args in [
            ("prefill_bf16_ms", prefill_bf16, (xp, wbf)),
            ("prefill_w8a8_ms", prefill_w8a8, (xp, w8, s8)),
            ("prefill_w4a16_kernel_ms", prefill_w4a16, (xp, w4, s4)),
            ("prefill_w4a8_kernel_ms", prefill_w4a8, (xp, w4, s4))]:
        try:
            secs = timed_loop(fn, *args, iters=3)
            report[name] = round(secs * 1e3, 3)
            tf = 2 * m * k * n / secs / 1e12
            report[name.replace("_ms", "_tfs")] = round(tf, 1)
            print(f"  {name}: {secs*1e3:.3f} ms ({tf:.0f} TF/s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — probe records failures
            report[name] = f"FAILED: {type(e).__name__}"
            print(f"  {name}: FAILED {e}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "int4_probe.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
