"""Probe: bias-folded windowed-attention kernel vs dispatched variants.

The folded kernel rides the decomposed rel-pos bias INSIDE the QK
contraction ([q*scale | rh | rw] @ [k | onehot_h | onehot_w]^T), turning
three MXU passes + two (S, S) VPU adds per window-head into one K=108
contraction. This probe measures it at the real SAM-H/512 windowed shape
(288 windows x 196 tokens x 16 heads x 80 dim) against:

  * grouped v1 (head-folded layout, the S<=1024 dispatch)
  * raw-layout v2 at group 2 (the windowed production path)

Measured 2026-08-17 (bf16, slope-timed): grouped_v1 7.71 · v2_raw 4.02 ·
folded(head-folded) 6.51-7.05 · folded_v2(raw) 4.52 ms. Folding beats
the three-dot formulation within the same layout but the raw-layout v2
path stays fastest overall — dispatch unchanged. group 32 folded OOMs
the 16 MB scoped VMEM (18.75M).

Run: python benchmarks/sam_folded_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _timing import timed_loop

NWIN, S, H, D = 288, 196, 16, 80
WIN = 14


def main():
    report = {"shape": [NWIN, S, H, D]}
    q = jax.jit(lambda: 0.02 * jnp.ones((NWIN, S, H, D), jnp.bfloat16))()
    rel = jax.jit(lambda: 0.01 * jnp.ones((2 * WIN - 1, D), jnp.float32))()

    from grove_tpu.ops.sam_attention import (
        folded_window_attention_relpos, folded_window_attention_relpos_v2,
        grouped_window_attention_relpos,
        grouped_window_attention_relpos_v2, relpos_terms,
        relpos_terms_raw)

    rh, rw = relpos_terms(q, rel, rel, (WIN, WIN))
    qc = jax.jit(lambda a: a.reshape(NWIN, S, H * D))(q)
    rpk = relpos_terms_raw(qc, rel, rel, (WIN, WIN), H)

    def t(name, fn, *args, iters=8):
        secs = timed_loop(fn, *args, iters=iters)
        report[name] = round(secs * 1e3, 2)
        print(f"  {name}: {secs*1e3:.2f} ms", flush=True)

    t("grouped_v1_g16",
      lambda a, hh, ww: grouped_window_attention_relpos(
          a, a, a, hh, ww, (WIN, WIN), group=16), q, rh, rw)
    t("v2_raw_g2",
      lambda a, r: grouped_window_attention_relpos_v2(
          a, a, a, r, (WIN, WIN), num_heads=H, group=2), qc, rpk)
    for grp in (4, 8, 16):
        t(f"folded_g{grp}",
          lambda a, hh, ww, g=grp: folded_window_attention_relpos(
              a, a, a, hh, ww, (WIN, WIN), group=g), q, rh, rw)
    t("folded_v2_g2",
      lambda a, hh, ww: folded_window_attention_relpos_v2(
          a, a, a, hh, ww, (WIN, WIN), num_heads=H, group=2), qc, rh, rw)

    got = folded_window_attention_relpos(q, q, q, rh, rw, (WIN, WIN))
    ref = grouped_window_attention_relpos(q, q, q, rh, rw, (WIN, WIN))
    report["folded_vs_grouped_maxdiff"] = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"  folded vs grouped diff: "
          f"{report['folded_vs_grouped_maxdiff']:.2e}", flush=True)

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
