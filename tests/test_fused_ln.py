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


def test_add_ln_quant_matches_chain(rng):
    """Fused add+LN+quant (two outputs) == add then the reference chain,
    including a ragged last block and bf16 inputs."""
    from grove_tpu.ops.fused_ln import add_layernorm_quant
    a = jnp.asarray(rng.normal(size=(21, 256)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(21, 256)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    bt = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    s = jnp.asarray(0.021, jnp.float32)
    resid, q = add_layernorm_quant(a, b, g, bt, s, eps=1e-6, block_rows=8)
    want_resid = np.asarray(a + b, np.float32)
    np.testing.assert_array_equal(np.asarray(resid, np.float32), want_resid)
    want_q = _reference(want_resid, g, bt, s, 1e-6)
    diff = np.abs(np.asarray(q).astype(np.int32) - want_q.astype(np.int32))
    assert (diff <= 1).all()
    # bf16 inputs land many normalized values near .5 rounding
    # boundaries, where the kernel's pre-folded (g/s, b/s) arithmetic
    # legitimately differs from the post-divide chain by 1 LSB
    assert (diff == 0).mean() > 0.9


def test_add_ln_quant_leading_dims(rng):
    """(B, H, W, C) input keeps its shape on both outputs."""
    from grove_tpu.ops.fused_ln import add_layernorm_quant
    a = jnp.asarray(rng.normal(size=(2, 3, 4, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 3, 4, 128)).astype(np.float32))
    g = jnp.ones((128,), jnp.float32)
    bt = jnp.zeros((128,), jnp.float32)
    resid, q = add_layernorm_quant(a, b, g, bt, jnp.asarray(0.03))
    assert resid.shape == a.shape and q.shape == a.shape
    assert q.dtype == jnp.int8
    want = _reference(np.asarray(a) + np.asarray(b), g, bt, 0.03, 1e-6)
    assert (np.abs(np.asarray(q).astype(int)
                   - want.reshape(2, 3, 4, 128).astype(int)) <= 1).all()
