"""Probe: SAM windowed-attention formulations at the real full-scale shape.

`sam_breakdown.py` shows the windowed attention kernel at ~4 TF/s
(13.4 ms for 56 GFLOP at nwin=288, s=196, h=16, d=80) — 2% MXU. The
196/80 dims sit badly on the 128-lane MXU. Candidates:

  a) current fused Pallas rel-pos kernel
  b) plain XLA attention (no bias), current fallback shape
  c) XLA attention with tokens padded 196->256 (+mask), head dim kept 80
  d) XLA attention padded 196->256 AND head dim 80->128
  e) jax.nn.dot_product_attention (XLA SDPA path), padded 256
  f) (c) plus the decomposed rel-pos bias materialized (the real contender:
     pad + bias, semantics preserved)

Run: python benchmarks/sam_attn_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import timed_loop

NWIN, S, H, D = 288, 196, 16, 80
SP, DP = 256, 128
WIN = 14


def main():
    report = {"shape": [NWIN, S, H, D]}
    q = jax.jit(lambda: 0.02 * jnp.ones((NWIN, S, H, D), jnp.bfloat16))()
    rel = jax.jit(lambda: 0.01 * jnp.ones((2 * WIN - 1, D), jnp.float32))()

    from grove_tpu.ops.attention import multi_head_attention, xla_attention
    from grove_tpu.ops.sam_attention import sam_attention_with_relpos

    def t(name, fn, *args, iters=8):
        secs = timed_loop(fn, *args, iters=iters)
        report[name] = round(secs * 1e3, 2)
        print(f"  {name}: {secs*1e3:.2f} ms", flush=True)

    from grove_tpu.ops.sam_attention_bwd import relpos_flash_attention
    t("a_fused_pallas_relpos",
      lambda a, r: relpos_flash_attention(a, a, a, r, r, (WIN, WIN)),
      q, rel)
    t("b_xla_plain", lambda a: multi_head_attention(a, a, a, impl="xla"), q)

    qp = jax.jit(lambda a: jnp.pad(a, ((0, 0), (0, SP - S), (0, 0),
                                       (0, 0))))(q)
    mask = jnp.arange(SP) < S          # valid keys
    bias_pad = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)

    def xla_padded(a):
        scores_mask = bias_pad[None, None, None, :]
        return xla_attention(a, a, a, bias=scores_mask)
    t("c_xla_pad256", xla_padded, qp)

    qpd = jax.jit(lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, 0),
                                        (0, DP - D))))(qp)
    t("d_xla_pad256_head128", xla_padded, qpd)

    def sdpa(a):
        return jax.nn.dot_product_attention(
            a, a, a, bias=bias_pad[None, None, None, :])
    t("e_sdpa_pad256", sdpa, qp)

    # real contender: padded XLA attention with the decomposed rel-pos
    # bias (exact semantics: bias from UNSCALED q, added post-scaling)
    def padded_relpos(a, r):
        b = a.shape[0]
        qq = a[:, :S].reshape(b, WIN, WIN, H, D)
        from grove_tpu.ops.sam_encoder_tables import rel_pos_index
        idx = rel_pos_index(WIN, WIN)
        R = r[idx]                                   # (14, 14, D)
        rel_h = jnp.einsum("bhwnc,hkc->bnhwk", qq, R.astype(a.dtype))
        rel_w = jnp.einsum("bhwnc,wkc->bnhwk", qq, R.astype(a.dtype))
        bias = rel_h[..., :, None] + rel_w[..., None, :]
        bias = bias.reshape(b, H, S, S)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, SP - S), (0, SP - S)))
        bias = bias + bias_pad[None, None, None, :]
        return xla_attention(a, a, a, bias=bias)
    t("f_xla_pad256_relpos_bias", padded_relpos, qp, rel)

    # g) one-pass grouped kernel (the fix: G window-heads per grid cell)
    from grove_tpu.ops.sam_attention import (grouped_window_attention_relpos,
                                             relpos_terms)
    rh, rw = relpos_terms(q, rel, rel, (WIN, WIN))
    for grp in (8, 16, 32):
        t(f"g_grouped_pallas_{grp}",
          lambda a, hh, ww: grouped_window_attention_relpos(
              a, a, a, hh, ww, (WIN, WIN), group=grp), q, rh, rw)
    ref_g = grouped_window_attention_relpos(q, q, q, rh, rw, (WIN, WIN))
    ref_a = relpos_flash_attention(q, q, q, rel, rel, (WIN, WIN))
    report["g_vs_flash_maxdiff"] = float(jnp.max(jnp.abs(
        ref_g.astype(jnp.float32) - ref_a.astype(jnp.float32))))
    print(f"  grouped vs flash diff: {report['g_vs_flash_maxdiff']:.2e}",
          flush=True)

    # numerics: (f) must match (a) on the valid region
    ref = sam_attention_with_relpos(q, q, q, rel, rel, (WIN, WIN))
    got = padded_relpos(qp, rel)[:, :S]
    diff = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                 - got.astype(jnp.float32))))
    report["f_vs_a_maxdiff"] = diff
    print(f"  f vs a max abs diff: {diff:.2e}", flush=True)

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()


def probe_v2():
    """Separate entry: layout-preserving v2 (raw (B,S,C) inputs)."""
    import jax, jax.numpy as jnp, json
    from grove_tpu.ops.sam_attention import (
        grouped_window_attention_relpos_v2, relpos_terms, relpos_terms_raw)
    report = {}
    q = jax.jit(lambda: 0.02 * jnp.ones((NWIN, S, H, D), jnp.bfloat16))()
    rel = jax.jit(lambda: 0.01 * jnp.ones((2 * WIN - 1, D), jnp.float32))()
    rh, rw = relpos_terms(q, rel, rel, (WIN, WIN))
    qc = jax.jit(lambda a: a.reshape(NWIN, S, H * D))(q)
    rpk = relpos_terms_raw(qc, rel, rel, (WIN, WIN), H)

    def t(name, fn, *args, iters=8):
        secs = timed_loop(fn, *args, iters=iters)
        report[name] = round(secs * 1e3, 2)
        print(f"  {name}: {secs*1e3:.2f} ms", flush=True)

    for grp in (2, 4, 8):
        t(f"v2_grouped_{grp}",
          lambda a, r, g=grp: grouped_window_attention_relpos_v2(
              a, a, a, r, (WIN, WIN), num_heads=H, group=g),
          qc, rpk)
    print(json.dumps(report))
    return report
