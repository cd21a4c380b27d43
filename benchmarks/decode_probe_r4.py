"""Round-4 decode proj-stack variants at the b16 decode shape.

The r3 proj stack (7 int4 matmuls/layer, bf16 activations, int8-native
nibble unpack) streams ~346 GB/s while the int8-KV attention kernel
proves ~728 GB/s on the same chip. Two hypotheses for the gap:

1. MXU row under-utilization: at M=16 a (16, K) x (K, N) dot uses 16 of
   the systolic array's 128 rows, so the weight-stationary passes cost
   ~8x their ideal streaming time. int8 x int8 dots run the MXU at 2x
   the bf16 rate -> W4A8 decode (kernel `int4_matmul_a8`) halves that
   bound. (The old "+0.4 ms/step" rejection of decode act-quant predates
   both the int8-native unpack and the super-group blocking.)
2. Launch/grid fixed costs across 224 kernel calls/step -> fused qkv
   (N=3d) and gate_up (N=2*inter) cut calls to 128/step and fatten
   each grid's N.

This probe times each variant's 32-layer proj stack in isolation with
the carry-chained harness.

Run: python benchmarks/decode_probe_r4.py [--batch 16]
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

from _timing import timed_loop  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--out", default="")
    args = p.parse_args()

    from grove_tpu.config import GroveConfig
    from grove_tpu.ops.int4_matmul import int4_matmul, int4_matmul_a8
    from grove_tpu.ops.quant import quantize_kernel_int4
    from grove_tpu.models.layers import quant_act

    cfg = GroveConfig().llama
    d, inter, nl = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    b = args.batch
    rng = np.random.default_rng(0)
    report = {"batch": b}

    def mk(k, n):
        w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
        q, s = quantize_kernel_int4(w, group=128)
        return jnp.asarray(q), jnp.asarray(s)

    # per-layer weights, separate and fused layouts (fused = columns
    # concatenated, bit-identical outputs column-wise)
    qkv = [mk(d, d) for _ in range(3)]
    o = mk(d, d)
    gate, up = mk(d, inter), mk(d, inter)
    down = mk(inter, d)
    qkv_f = mk(d, 3 * d)
    gu_f = mk(d, 2 * inter)

    wbytes_sep = (4 * d * d // 2 + 2 * d * inter // 2 + inter * d // 2
                  + (4 * (d // 128) * d + 2 * (d // 128) * inter
                     + (inter // 128) * d) * 4)

    def stack(layer):
        def f(x):
            for _ in range(nl):
                x = layer(x) * 1e-3 + x
            return x
        return f

    def run(name, layer, wbytes):
        secs = timed_loop(stack(layer), x0, iters=3, perturb=0, extra=30,
                          repeats=3)
        gbs = nl * wbytes / secs / 1e9
        report[name] = {"ms": round(secs * 1e3, 2), "gbs": round(gbs, 1)}
        print(f"{name}: {secs*1e3:.2f} ms ({gbs:.0f} GB/s)", flush=True)

    x0 = jax.jit(lambda: jnp.ones((b, d), jnp.bfloat16))()

    # 1. current production: 7 separate bf16-act matmuls
    def layer_sep(x):
        h = sum(int4_matmul(x, q, s, block_m=8) for q, s in qkv)
        h = int4_matmul(h, *o, block_m=8)
        a = (int4_matmul(h, *gate, block_m=8)
             * int4_matmul(h, *up, block_m=8))
        return int4_matmul(a, *down, block_m=8)

    run("sep_bf16", layer_sep, wbytes_sep)

    # 2. fused qkv + gate_up (4 matmuls/layer)
    def layer_fused(x):
        h = int4_matmul(x, *qkv_f, block_m=8)
        h = h[:, :d] + h[:, d:2 * d] + h[:, 2 * d:]
        h = int4_matmul(h, *o, block_m=8)
        gu = int4_matmul(h, *gu_f, block_m=8)
        a = gu[:, :inter] * gu[:, inter:]
        return int4_matmul(a, *down, block_m=8)

    run("fused_bf16", layer_fused, wbytes_sep)

    # 3. W4A8: per-token int8 activations, int8 MXU dots
    def layer_a8(x):
        xq, sx = quant_act(x)
        h = sum(int4_matmul_a8(xq, sx, q, s, block_m=8) for q, s in qkv)
        hq, sh = quant_act(h)
        h = int4_matmul_a8(hq, sh, *o, block_m=8)
        a = (int4_matmul_a8(hq, sh, *gate, block_m=8)
             * int4_matmul_a8(hq, sh, *up, block_m=8))
        aq, sa = quant_act(a)
        return int4_matmul_a8(aq, sa, *down, block_m=8)

    run("sep_a8", layer_a8, wbytes_sep)

    # 3b. stream-floor control (VERDICT r4 #4 "measured proof" arm): the
    # SAME grid/blocking/byte traffic as the W4A8 kernel, body cut to ONE
    # int8 dot on the packed block — no nibble unpack, no second plane
    # dot, no bias correction. Numerically meaningless output; its ONLY
    # purpose is timing: if stack time ~= sep_a8's, the unpack VPU chain
    # and the extra dot are fully hidden under the weight-block DMA and
    # the kernel is at its stream floor for this access pattern.
    import functools

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from grove_tpu.ops.int4_matmul import _pick_blocks

    def _kernel_stream(x_ref, w_ref, o_ref, acc_ref, *, k_blocks, group,
                       supers):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        dn = (((1,), (0,)), ((), ()))
        for t in range(supers):
            xl = x_ref[:, t * 2 * group:t * 2 * group + group]
            w = w_ref[t * group:(t + 1) * group, :]
            a = jax.lax.dot_general(xl, w, dn,
                                    preferred_element_type=jnp.int32)
            acc_ref[...] += a.astype(jnp.float32)

        @pl.when(kk == k_blocks - 1)
        def _store():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def stream_matmul(xq, wp, n_groups):
        m, k = xq.shape
        kh, n = wp.shape
        group = k // n_groups
        k_steps = n_groups // 2
        bm, bn, supers = _pick_blocks(m, n, group, 1, 2, 8, 0, k_steps)
        pad_m = (-m) % bm
        if pad_m:
            xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        mp = m + pad_m
        k_blocks = k_steps // supers
        kern = functools.partial(_kernel_stream, k_blocks=k_blocks,
                                 group=group, supers=supers)
        out = pl.pallas_call(
            kern,
            grid=(mp // bm, n // bn, k_blocks),
            in_specs=[
                pl.BlockSpec((bm, supers * 2 * group),
                             lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((supers * group, bn),
                             lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(xq, wp)
        return out[:m] if pad_m else out

    stream_j = jax.jit(stream_matmul, static_argnums=(2,))

    def layer_stream(x):
        xq, _ = quant_act(x)
        h = sum(stream_j(xq, q, s.shape[0])
                for q, s in qkv).astype(jnp.bfloat16)
        hq, _ = quant_act(h)
        h = stream_j(hq, o[0], o[1].shape[0])
        a = (stream_j(hq, gate[0], gate[1].shape[0])
             * stream_j(hq, up[0], up[1].shape[0]))
        aq, _ = quant_act(a)
        return stream_j(aq, down[0], down[1].shape[0])

    run("stream_floor_a8", layer_stream, wbytes_sep)

    # 3c. stacked single-dot W4A8: unpack both nibble planes, stack them
    # into one (2G, bn) int8 weight tile in VMEM, and contract x's full
    # 2G-column super-group in ONE MXU dot instead of two G-dots. Same
    # bytes, same unpack VPU work, half the per-dot fixed costs (tile
    # feed latency dominates at bm=8). Scales can't fold per-plane into
    # one dot, so the hi plane's 16x and the per-plane group scales are
    # handled like _kernel_a8 but with the plane dots' outputs recovered
    # from one dot via pre-scaling x columns is NOT possible (integer
    # operands) — instead both planes share one group scale row pair by
    # splitting the dot result is impossible; so this variant measures
    # the SHAPE effect only: it uses lo' = lo+8 and hi' = 16*hi planes
    # stacked, applies a single merged f32 scale per output block, and is
    # numerically a different (wrong) linear map. Timing-only control,
    # like 3b.
    def _kernel_stacked(x_ref, w_ref, o_ref, acc_ref, *, k_blocks, group,
                        supers):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        dn = (((1,), (0,)), ((), ()))
        for t in range(supers):
            x = x_ref[:, t * 2 * group:(t + 1) * 2 * group]  # (bm, 2G)
            p = w_ref[t * group:(t + 1) * group, :]
            lo_b = (p & 15) ^ 8
            hi16 = p & -16
            w2 = jnp.concatenate([lo_b, hi16], axis=0)       # (2G, bn)
            a = jax.lax.dot_general(x, w2, dn,
                                    preferred_element_type=jnp.int32)
            a -= 8 * jnp.sum(x[:, :group].astype(jnp.int32), axis=1,
                             keepdims=True)
            acc_ref[...] += a.astype(jnp.float32)

        @pl.when(kk == k_blocks - 1)
        def _store():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def stacked_matmul(xq, wp, n_groups):
        m, k = xq.shape
        kh, n = wp.shape
        group = k // n_groups
        k_steps = n_groups // 2
        bm, bn, supers = _pick_blocks(m, n, group, 1, 2, 8, 0, k_steps)
        pad_m = (-m) % bm
        if pad_m:
            xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        mp = m + pad_m
        k_blocks = k_steps // supers
        kern = functools.partial(_kernel_stacked, k_blocks=k_blocks,
                                 group=group, supers=supers)
        out = pl.pallas_call(
            kern,
            grid=(mp // bm, n // bn, k_blocks),
            in_specs=[
                pl.BlockSpec((bm, supers * 2 * group),
                             lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((supers * group, bn),
                             lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(xq, wp)
        return out[:m] if pad_m else out

    stacked_j = jax.jit(stacked_matmul, static_argnums=(2,))

    def layer_stacked(x):
        xq, _ = quant_act(x)
        h = sum(stacked_j(xq, q, s.shape[0])
                for q, s in qkv).astype(jnp.bfloat16)
        hq, _ = quant_act(h)
        h = stacked_j(hq, o[0], o[1].shape[0])
        a = (stacked_j(hq, gate[0], gate[1].shape[0])
             * stacked_j(hq, up[0], up[1].shape[0]))
        aq, _ = quant_act(a)
        return stacked_j(aq, down[0], down[1].shape[0])

    run("stacked_1dot_a8", layer_stacked, wbytes_sep)

    # 4. fused + W4A8
    def layer_fused_a8(x):
        xq, sx = quant_act(x)
        h = int4_matmul_a8(xq, sx, *qkv_f, block_m=8)
        h = h[:, :d] + h[:, d:2 * d] + h[:, 2 * d:]
        hq, sh = quant_act(h)
        h = int4_matmul_a8(hq, sh, *o, block_m=8)
        gu = int4_matmul_a8(hq, sh, *gu_f, block_m=8)
        a = gu[:, :inter] * gu[:, inter:]
        aq, sa = quant_act(a)
        return int4_matmul_a8(aq, sa, *down, block_m=8)

    run("fused_a8", layer_fused_a8, wbytes_sep)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
