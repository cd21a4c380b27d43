"""Fused rel-pos flash attention == XLA bias-materializing path."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grove_tpu.models.sam_encoder import decomposed_rel_pos_bias
from grove_tpu.ops.attention import xla_attention
from grove_tpu.ops.sam_attention import (flash_attention_relpos,
                                         relpos_terms,
                                         sam_attention_with_relpos)


def _setup(rng, b=1, gh=16, gw=16, nh=2, d=8):
    s = gh * gw
    q = jnp.asarray(rng.normal(size=(b, s, nh, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, nh, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, nh, d)).astype(np.float32))
    rel_h = jnp.asarray(rng.normal(size=(2 * gh - 1, d)).astype(np.float32))
    rel_w = jnp.asarray(rng.normal(size=(2 * gw - 1, d)).astype(np.float32))
    return q, k, v, rel_h, rel_w, (gh, gw)


def test_relpos_terms_reconstruct_bias(rng):
    q, k, v, rel_h, rel_w, hw = _setup(rng)
    gh, gw = hw
    bias = np.asarray(decomposed_rel_pos_bias(q, rel_h, rel_w, hw))
    rh, rw = relpos_terms(q, rel_h, rel_w, hw)
    rh, rw = np.asarray(rh), np.asarray(rw)
    s = gh * gw
    recon = np.zeros_like(bias)
    for qi in range(s):
        for kj in range(s):
            recon[:, :, qi, kj] = (rh[:, :, qi, kj // gw]
                                   + rw[:, :, qi, kj % gw])
    np.testing.assert_allclose(recon, bias, rtol=1e-4, atol=1e-5)


def test_fused_kernel_matches_xla(rng):
    q, k, v, rel_h, rel_w, hw = _setup(rng)
    d = q.shape[-1]
    bias = decomposed_rel_pos_bias(q, rel_h, rel_w, hw)
    want = np.asarray(xla_attention(q, k, v, bias=bias,
                                    scale=1.0 / math.sqrt(d)))
    rh, rw = relpos_terms(q, rel_h, rel_w, hw)
    got = np.asarray(flash_attention_relpos(q, k, v, rh, rw, hw,
                                            block_q=64, block_k=64))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dispatcher_fallback_matches(rng):
    # non-conforming shape (s not multiple of 128) -> XLA path
    q, k, v, rel_h, rel_w, hw = _setup(rng, gh=4, gw=4)
    d = q.shape[-1]
    out = sam_attention_with_relpos(q, k, v, rel_h, rel_w, hw)
    bias = decomposed_rel_pos_bias(q, rel_h, rel_w, hw)
    want = xla_attention(q, k, v, bias=bias, scale=1.0 / math.sqrt(d))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_path_gradients_match_xla(rng):
    """custom_vjp: grads through the fused path equal the XLA-path grads."""
    from grove_tpu.ops.sam_attention import sam_attention_with_relpos
    gh = gw = 8
    s = gh * gw
    nh, d = 2, 8
    q = jnp.asarray(rng.normal(size=(1, s, nh, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, s, nh, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, s, nh, d)).astype(np.float32))
    rh = jnp.asarray(rng.normal(size=(2 * gh - 1, d)).astype(np.float32))
    rw = jnp.asarray(rng.normal(size=(2 * gw - 1, d)).astype(np.float32))

    def loss(impl):
        def f(*a):
            return jnp.sum(sam_attention_with_relpos(
                *a, (gh, gw), impl=impl) ** 2)
        return f

    g1 = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    g2 = jax.grad(loss("xla"), argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_grouped_window_kernel_matches_xla(rng):
    """One-pass grouped kernel (windowed dispatch, S<=256) at the real
    14x14 window shape, several windows per cell."""
    from grove_tpu.ops.sam_attention import grouped_window_attention_relpos
    q, k, v, rel_h, rel_w, hw = _setup(rng, b=6, gh=14, gw=14, nh=4, d=8)
    d = q.shape[-1]
    bias = decomposed_rel_pos_bias(q, rel_h, rel_w, hw)
    want = np.asarray(xla_attention(q, k, v, bias=bias,
                                    scale=1.0 / math.sqrt(d)))
    rh, rw = relpos_terms(q, rel_h, rel_w, hw)
    got = np.asarray(grouped_window_attention_relpos(q, k, v, rh, rw, hw,
                                                     group=8))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_grouped_dispatch_and_gradients(rng):
    """impl='pallas' at S=196 routes to the grouped kernel; grads match
    the XLA path (backward delegates to the flash bwd kernels)."""
    q, k, v, rel_h, rel_w, hw = _setup(rng, b=2, gh=14, gw=14, nh=2, d=8)
    d = q.shape[-1]
    out = sam_attention_with_relpos(q, k, v, rel_h, rel_w, hw,
                                    impl="pallas")
    bias = decomposed_rel_pos_bias(q, rel_h, rel_w, hw)
    want = xla_attention(q, k, v, bias=bias, scale=1.0 / math.sqrt(d))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    def loss(impl):
        def f(*a):
            return jnp.sum(sam_attention_with_relpos(*a, hw,
                                                     impl=impl) ** 2)
        return f
    g1 = jax.grad(loss("pallas"), argnums=(0, 2, 3))(q, k, v, rel_h, rel_w)
    g2 = jax.grad(loss("xla"), argnums=(0, 2, 3))(q, k, v, rel_h, rel_w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_grouped_v2_layout_preserving_matches_xla(rng):
    """v2 kernel consumes raw (B, S, H*D) projections (no fold
    transposes); outputs must match the bias-materializing XLA path."""
    from grove_tpu.ops.sam_attention import (
        grouped_window_attention_relpos_v2, relpos_terms_raw)
    q4, k4, v4, rel_h, rel_w, hw = _setup(rng, b=6, gh=14, gw=14, nh=4,
                                          d=8)
    d = q4.shape[-1]
    bias = decomposed_rel_pos_bias(q4, rel_h, rel_w, hw)
    want = np.asarray(xla_attention(q4, k4, v4, bias=bias,
                                    scale=1.0 / math.sqrt(d)))

    def flat(x):  # (B,S,H,D) -> (B,S,H*D)
        b, s, h, dd = x.shape
        return x.reshape(b, s, h * dd)
    rel = relpos_terms_raw(flat(q4), rel_h, rel_w, hw, 4)
    # packed layout == the old per-head (B,H,S,g) terms, re-interleaved
    rh, rw = relpos_terms(q4, rel_h, rel_w, hw)
    b_, s_ = q4.shape[:2]
    want_rel = np.concatenate(
        [np.asarray(rh).transpose(0, 2, 1, 3),
         np.asarray(rw).transpose(0, 2, 1, 3)], axis=-1)
    np.testing.assert_allclose(
        np.asarray(rel).reshape(b_, s_, 4, -1), want_rel,
        rtol=1e-5, atol=1e-5)
    got = grouped_window_attention_relpos_v2(
        flat(q4), flat(k4), flat(v4), rel, hw, num_heads=4, group=3)
    got = np.asarray(got).reshape(want.shape[0], want.shape[1], 4, d)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_folded_kernels_match_xla(rng):
    """Bias-folded kernels ([q*scale|rh|rw] @ [k|onehot]^T) == the XLA
    bias-materializing path, in both head-folded and raw layouts."""
    from grove_tpu.ops.sam_attention import (
        folded_window_attention_relpos, folded_window_attention_relpos_v2)
    q, k, v, rel_h, rel_w, hw = _setup(rng, b=3, gh=14, gw=14, nh=4, d=8)
    b, s, nh, d = q.shape
    bias = decomposed_rel_pos_bias(q, rel_h, rel_w, hw)
    want = np.asarray(xla_attention(q, k, v, bias=bias,
                                    scale=1.0 / math.sqrt(d)))
    rh, rw = relpos_terms(q, rel_h, rel_w, hw)

    got = np.asarray(folded_window_attention_relpos(q, k, v, rh, rw, hw,
                                                    group=4))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def flat(x):
        return x.reshape(b, s, nh * d)
    got2 = folded_window_attention_relpos_v2(
        flat(q), flat(k), flat(v), rh, rw, hw, num_heads=nh, group=3)
    got2 = np.asarray(got2).reshape(b, s, nh, d)
    np.testing.assert_allclose(got2, want, rtol=2e-4, atol=2e-5)


def test_raw_layout_window_attention_matches_and_grads(rng):
    """sam_window_attention_raw (v2 lane-sliced kernel, raw (nW, S, H*D)
    layout) == the XLA bias-materializing path, forward and backward."""
    from grove_tpu.ops.sam_attention import sam_window_attention_raw

    q, k, v, rel_h, rel_w, hw = _setup(rng, b=3, gh=14, gw=14, nh=2, d=8)
    b, s, nh, d = q.shape
    c = nh * d
    qr, kr, vr = (t.reshape(b, s, c) for t in (q, k, v))

    got = np.asarray(sam_window_attention_raw(qr, kr, vr, rel_h, rel_w,
                                              hw, nh))
    bias = decomposed_rel_pos_bias(q, rel_h, rel_w, hw)
    want = np.asarray(xla_attention(q, k, v, bias=bias,
                                    scale=1.0 / math.sqrt(d))
                      ).reshape(b, s, c)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def loss_raw(qr, kr, vr, rh, rw):
        out = sam_window_attention_raw(qr, kr, vr, rh, rw, hw, nh)
        return jnp.sum(out * out)

    def loss_ref(qr, kr, vr, rh, rw):
        qh, kh, vh = (t.reshape(b, s, nh, d) for t in (qr, kr, vr))
        bias = decomposed_rel_pos_bias(qh, rh, rw, hw)
        out = xla_attention(qh, kh, vh, bias=bias,
                            scale=1.0 / math.sqrt(d)).reshape(b, s, c)
        return jnp.sum(out * out)

    g_raw = jax.grad(loss_raw, argnums=(0, 1, 2, 3, 4))(qr, kr, vr,
                                                        rel_h, rel_w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(qr, kr, vr,
                                                        rel_h, rel_w)
    for a, bb in zip(g_raw, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=5e-3, atol=5e-4)
