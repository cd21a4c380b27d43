"""Probe: packed-int4 weights on this chip — bytes, decode dots, kernels.

Questions this answers (each gates the int4 serving mode's value):
  1. Do packed-int4 weights (2 values per int8 byte, `ops.quant.pack_int4`)
     occupy exactly half the int8 bytes in HBM? (Trivially yes for int8
     storage — asserted via live device memory_stats as a sanity check.
     NOTE: native `jnp.int4` arrays are NOT usable here: eager ops and
     jit-arg passing both recurse in device_put through the axon relay —
     that measurement is what forced the packed-int8 design.)
  2. Decode-shaped dots (weight-read-bound): does the grouped-einsum
     unpack path ride at int4 byte rate, or does XLA materialize the
     unpacked weights? Compared against bf16/int8 baselines and the
     Pallas kernel at the same shape.
  3. Prefill shapes: fused W4A16 (`int4_matmul`) and W4A8
     (`int4_matmul_a8`) kernels vs the bf16/int8 XLA baseline.

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
    g = 128

    from grove_tpu.ops.quant import pack_int4, quantize_kernel_int4
    from grove_tpu.ops.quant import unpack_int4

    rng = np.random.default_rng(0)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    wp_np, s_np = quantize_kernel_int4(w, group=g)

    # --- 1. bytes on device ---
    base = mem_used()
    wp = jnp.asarray(wp_np)                    # (k/2, n) int8
    fetch(jax.jit(lambda x: x.astype(jnp.int32).sum())(wp))
    used = mem_used() - base
    logical = k * n // 2
    report["int4_alloc_logical_mb"] = round(logical / 1e6, 1)
    report["int4_alloc_device_mb"] = round(used / 1e6, 1)
    report["int4_packed"] = bool(used < 1.5 * logical)
    print(f"packed int4 bytes OK: {report['int4_packed']} "
          f"(logical {logical/1e6:.0f} MB, device {used/1e6:.0f} MB)",
          flush=True)

    # --- 2. decode-shaped dots (weight-read-bound): b rows x (K, N) ---
    b = 8
    x = jax.jit(lambda: jnp.zeros((b, k), jnp.bfloat16))()
    wbf = jax.jit(lambda: jnp.zeros((k, n), jnp.bfloat16))()
    w8 = jax.jit(lambda: jnp.zeros((k, n), jnp.int8))()
    s8 = jax.jit(lambda: jnp.zeros((n,), jnp.float32))()
    s4 = jnp.asarray(s_np)

    def dot_bf16(x, w):
        return x @ w

    def dot_w8(x, w, s):
        return (x @ w.astype(x.dtype)) * s.astype(x.dtype)

    def dot_w4_grouped(x, wp, s):
        xg = x.reshape(b, k // g, g)
        wg = unpack_int4(wp, g)                # (k/g, g, n) int8
        y = jnp.einsum("bgk,gkn->bgn", xg, wg.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return (y * s).sum(axis=-2).astype(x.dtype)

    def dot_w4_kernel(x, wp, s):
        from grove_tpu.ops.int4_matmul import int4_matmul
        return int4_matmul(x, wp, s, block_m=8)

    for name, fn, args in [
            ("decode_dot_bf16_ms", dot_bf16, (x, wbf)),
            ("decode_dot_int8_ms", dot_w8, (x, w8, s8)),
            ("decode_dot_int4_grouped_ms", dot_w4_grouped, (x, wp, s4)),
            ("decode_dot_int4_kernel_ms", dot_w4_kernel, (x, wp, s4))]:
        try:
            # perturb ONLY the activation row: a one-element update on the
            # 45-90 MB weight forces a full copy per iteration (measured
            # 2.4 ms on the bf16 dot — 10x the dot itself). Caveat: with
            # weights loop-invariant, weight-only subgraphs (int8 convert,
            # int4 unpack) may hoist — the grouped-einsum number is
            # therefore an OPTIMISTIC bound; the kernel number (packed
            # bytes read in-kernel, nothing hoistable) and the full-model
            # decode step in full_scale.py are the honest ones.
            secs = timed_loop(fn, *args, iters=10, perturb=0,
                              extra=120, repeats=3)
            report[name] = round(secs * 1e3, 3)
            print(f"  {name}: {secs*1e3:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 — probe records failures
            report[name] = f"FAILED: {type(e).__name__}"
            print(f"  {name}: FAILED {e}", flush=True)

    # byte-rate interpretation: weight bytes / time
    for nm, bts in [("bf16", k * n * 2), ("int8", k * n),
                    ("int4_grouped", k * n // 2 + (k // g) * n * 4),
                    ("int4_kernel", k * n // 2 + (k // g) * n * 4)]:
        key = f"decode_dot_{nm}_ms"
        if isinstance(report.get(key), float) and report[key] > 0:
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

    def prefill_w4a16(x, wp, s):
        return int4_matmul(x, wp, s)

    def prefill_w4a8(x, wp, s):
        xq, sx = quant_act(x)
        return int4_matmul_a8(xq, sx, wp, s)

    for name, fn, args in [
            ("prefill_bf16_ms", prefill_bf16, (xp, wbf)),
            ("prefill_w8a8_ms", prefill_w8a8, (xp, w8, s8)),
            ("prefill_w4a16_kernel_ms", prefill_w4a16, (xp, wp, s4)),
            ("prefill_w4a8_kernel_ms", prefill_w4a8, (xp, wp, s4))]:
        try:
            secs = timed_loop(fn, *args, iters=3, perturb=0, repeats=3)
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
