"""Fused LayerNorm -> int8 quantize kernel (ops/fused_ln.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from grove_tpu.ops.fused_ln import layernorm_quant


def _reference(x, g, b, s, eps):
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) / np.sqrt(var + eps) * np.asarray(g) + np.asarray(b)
    return np.clip(np.round(y / float(s)), -127, 127).astype(np.int8)


def test_kernel_matches_reference_chain(rng):
    """use_kernel=True runs the Pallas kernel (interpret on CPU); must
    match the plain LN->round->clip chain to the LSB."""
    x = jnp.asarray(rng.normal(size=(3, 7, 256)).astype(np.float32)) * 3
    g = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    s = jnp.asarray(0.037, jnp.float32)
    got = np.asarray(layernorm_quant(x, g, b, s, eps=1e-6, block_rows=8, use_kernel=True))
    want = _reference(x, g, b, s, 1e-6)
    # round-to-even at exact .5 boundaries can differ by 1 LSB between
    # fused and two-pass arithmetic; everything else must be exact
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.999


def test_partial_last_block(rng):
    """Row count not divisible by block_rows: padded rows must not
    pollute valid rows (per-row stats)."""
    x = jnp.asarray(rng.normal(size=(13, 128)).astype(np.float32))
    g = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    got = np.asarray(layernorm_quant(x, g, b, jnp.asarray(0.02),
                                     eps=1e-6, block_rows=8,
                                     use_kernel=True))
    want = _reference(x, g, b, 0.02, 1e-6)
    assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()


def test_unaligned_width_fallback(rng):
    """C not lane-aligned takes the XLA fallback with identical
    semantics."""
    x = jnp.asarray(rng.normal(size=(5, 48)).astype(np.float32))
    g = jnp.ones((48,), jnp.float32)
    b = jnp.zeros((48,), jnp.float32)
    got = np.asarray(layernorm_quant(x, g, b, jnp.asarray(0.05)))
    want = _reference(x, g, b, 0.05, 1e-6)
    np.testing.assert_array_equal(got, want)


def test_bf16_input(rng):
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.bfloat16)
    g = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    got = np.asarray(layernorm_quant(x, g, b, jnp.asarray(0.05)))
    want = _reference(np.asarray(x, np.float32), g, b, 0.05, 1e-6)
    assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()
