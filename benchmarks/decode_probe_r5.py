"""Round-5 decode proj-stack kernel ladder (VERDICT r4 #3).

`DECODE_PROBE_r04.json` FALSIFIED the round-4 "unpack hides under the
weight DMA" hypothesis: the stream-floor control (same grid/blocking/
bytes, body cut to one packed-byte dot) runs 6.31 ms vs the real W4A8
kernel's 8.08 — ~1.8 ms of the body is serial on top of the stream.
This probe decomposes that gap with a ladder of kernel bodies, ALL at
identical blocking, and measures two candidate harvests:

  floor1      one int8 dot on the packed bytes, no unpack     [control]
  unpack1     + full nibble unpack (3 VPU ops/byte), still one dot
  two_dot     + the second plane dot + bias fix + f32 scales  [= prod]
  biased      two_dot with the PRE-BIASED pack (lo nibble stored q+8:
              unpack is 2 VPU ops/byte — the xor moves to pack time)
  nconcat     unpack, concat planes along N, ONE (bm,G)x(G,2*bn) dot,
              split columns for per-plane scales — exact numerics,
              half the dot issues per super-group

ladder deltas: (unpack1 - floor1) = VPU unpack cost not hidden;
(two_dot - unpack1) = second dot + f32 chain; (two_dot - biased) =
the xor's share; (two_dot - nconcat) = per-dot-issue fixed cost.

Every variant also runs at block_m=0 (bm=m, the IN-MODEL dispatch) next
to the r4 probe's block_m=8 — at m=16, bm=8 splits the grid into two
M-blocks and should re-stream the weights twice if DMAs are honest;
equal times would mean the second M-pass rides VMEM reuse.

Run: python benchmarks/decode_probe_r5.py [--batch 16]
        [--out DECODE_PROBE_r05.json]
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import timed_loop  # noqa: E402


def _body_floor1(x, p, s, group):
    a = jax.lax.dot_general(x[:, :group], p, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return a.astype(jnp.float32)


def _body_unpack1(x, p, s, group):
    lo_b = (p & jnp.int8(15)) ^ jnp.int8(8)
    hi16 = p & jnp.int8(-16)
    a = jax.lax.dot_general(x[:, :group], lo_b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    # keep hi16 live so the unpack isn't DCE'd: fold a cheap reduce in
    return (a + jnp.sum(hi16[:1, :].astype(jnp.int32), axis=0,
                        keepdims=True)).astype(jnp.float32)


def _body_two_dot(x, p, s, group):
    lo_b = (p & jnp.int8(15)) ^ jnp.int8(8)
    hi16 = p & jnp.int8(-16)
    xl = x[:, :group]
    dn = (((1,), (0,)), ((), ()))
    a = jax.lax.dot_general(xl, lo_b, dn,
                            preferred_element_type=jnp.int32)
    a -= 8 * jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True)
    b = jax.lax.dot_general(x[:, group:], hi16, dn,
                            preferred_element_type=jnp.int32)
    return (a.astype(jnp.float32) * s[0:1]
            + b.astype(jnp.float32) * (s[1:2] * 0.0625))


def _body_biased(x, p, s, group):
    # pack stores lo as (q+8): one & per plane, no xor
    lo_b = p & jnp.int8(15)
    hi16 = p & jnp.int8(-16)
    xl = x[:, :group]
    dn = (((1,), (0,)), ((), ()))
    a = jax.lax.dot_general(xl, lo_b, dn,
                            preferred_element_type=jnp.int32)
    a -= 8 * jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True)
    b = jax.lax.dot_general(x[:, group:], hi16, dn,
                            preferred_element_type=jnp.int32)
    return (a.astype(jnp.float32) * s[0:1]
            + b.astype(jnp.float32) * (s[1:2] * 0.0625))


def _body_nconcat(x, p, s, group):
    lo_b = (p & jnp.int8(15)) ^ jnp.int8(8)
    hi16 = p & jnp.int8(-16)
    w2 = jnp.concatenate([lo_b, hi16], axis=1)        # (G, 2*bn)
    bn = p.shape[1]
    xl = x[:, :group]
    # ONE dot covers both planes; xl must equal x_hi for exactness, so
    # this is exact ONLY when both plane dots share the activation rows —
    # they don't (lo plane pairs x[:, :G], hi pairs x[:, G:]). Timing
    # control like r4's stacked variant; kept for the issue-cost ladder.
    ab = jax.lax.dot_general(xl, w2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    a = ab[:, :bn] - 8 * jnp.sum(xl.astype(jnp.int32), axis=1,
                                 keepdims=True)
    b = ab[:, bn:]
    return (a.astype(jnp.float32) * s[0:1]
            + b.astype(jnp.float32) * (s[1:2] * 0.0625))


def make_matmul(body, name):
    from grove_tpu.ops.int4_matmul import _pick_blocks

    def kern(x_ref, sx_ref, w_ref, s_ref, o_ref, acc_ref, *, k_blocks,
             group, supers):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        for t in range(supers):
            x = x_ref[:, t * 2 * group:(t + 1) * 2 * group]
            p = w_ref[t * group:(t + 1) * group, :]
            acc_ref[...] += body(x, p, s_ref[t], group)

        @pl.when(kk == k_blocks - 1)
        def _store():
            o_ref[...] = (acc_ref[...] * sx_ref[...]).astype(o_ref.dtype)

    def matmul(xq, sx, wp, scale, block_m):
        m, k = xq.shape
        kh, n = wp.shape
        groups = scale.shape[0]
        group = k // groups
        k_steps = groups // 2
        bm, bn, supers = _pick_blocks(m, n, group, 1, 2, block_m, 0,
                                      k_steps)
        pad_m = (-m) % bm
        if pad_m:
            xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
            sx = jnp.pad(sx, ((0, pad_m), (0, 0)))
        mp = m + pad_m
        k_blocks = k_steps // supers
        kfn = functools.partial(kern, k_blocks=k_blocks, group=group,
                                supers=supers)
        out = pl.pallas_call(
            kfn,
            grid=(mp // bm, n // bn, k_blocks),
            in_specs=[
                pl.BlockSpec((bm, supers * 2 * group),
                             lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((supers * group, bn),
                             lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((supers, 2, bn), lambda i, j, kk: (kk, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(xq, sx.astype(jnp.float32), wp,
          scale.astype(jnp.float32).reshape(k_steps, 2, n))
        return out[:m] if pad_m else out

    matmul.__name__ = name
    return jax.jit(matmul, static_argnums=(4,))


BODIES = {"floor1": _body_floor1, "unpack1": _body_unpack1,
          "two_dot": _body_two_dot, "biased": _body_biased,
          "nconcat": _body_nconcat}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--variants", default=",".join(BODIES))
    p.add_argument("--block_ms", default="8,0",
                   help="comma list; 0 = in-model auto (bm=m)")
    p.add_argument("--out", default="")
    args = p.parse_args()

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.layers import quant_act
    from grove_tpu.ops.quant import quantize_kernel_int4

    cfg = GroveConfig().llama
    d, inter, nl = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    b = args.batch
    rng = np.random.default_rng(0)
    report = {"batch": b}

    def mk(k, n):
        w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
        q, s = quantize_kernel_int4(w, group=128)
        return jnp.asarray(q), jnp.asarray(s)

    qkv = [mk(d, d) for _ in range(3)]
    o = mk(d, d)
    gate, up = mk(d, inter), mk(d, inter)
    down = mk(inter, d)
    wbytes = (4 * d * d // 2 + 2 * d * inter // 2 + inter * d // 2
              + (4 * (d // 128) * d + 2 * (d // 128) * inter
                 + (inter // 128) * d) * 4)

    x0 = jax.jit(lambda: jnp.ones((b, d), jnp.bfloat16))()

    for bm in [int(v) for v in args.block_ms.split(",")]:
        for vname in args.variants.split(","):
            mm = make_matmul(BODIES[vname], vname)

            def layer(x):
                xq, sx = quant_act(x)
                h = sum(mm(xq, sx, q, s, bm) for q, s in qkv)
                hq, sh = quant_act(h)
                h = mm(hq, sh, *o, bm)
                a = mm(hq, sh, *gate, bm) * mm(hq, sh, *up, bm)
                aq, sa = quant_act(a)
                return mm(aq, sa, *down, bm)

            def stack(x):
                for _ in range(nl):
                    x = layer(x) * 1e-3 + x
                return x

            secs = timed_loop(stack, x0, iters=3, perturb=0, extra=30,
                              repeats=3)
            gbs = nl * wbytes / secs / 1e9
            key = f"{vname}_bm{bm}"
            report[key] = {"ms": round(secs * 1e3, 2),
                           "gbs": round(gbs, 1)}
            print(f"{key}: {secs*1e3:.2f} ms ({gbs:.0f} GB/s)",
                  flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
