"""Pallas window partition/unpartition kernels (ops/window_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from grove_tpu.models.sam_encoder import (window_partition,
                                          window_unpartition)
from grove_tpu.ops.window_ops import (window_partition_fused,
                                      window_unpartition_fused)


def test_partition_matches_reference(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 8)).astype(np.float32))
    want, pad_hw = window_partition(x, 4)
    got = window_partition_fused(x, 4)
    assert pad_hw == (12, 12)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_partition_exact_divisor(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    want, _ = window_partition(x, 4)
    got = window_partition_fused(x, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_unpartition_matches_reference(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 8)).astype(np.float32))
    wins, pad_hw = window_partition(x, 4)
    want = window_unpartition(wins, 4, pad_hw, (10, 10))
    got = window_unpartition_fused(wins, 4, (10, 10))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # full round trip is the identity
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


def test_int8_dtype(rng):
    x = jnp.asarray(rng.integers(-127, 128, size=(2, 10, 10, 8)),
                    jnp.int8)
    want, _ = window_partition(x, 4)
    got = window_partition_fused(x, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gradients_are_adjoints(rng):
    """partition's VJP must be unpartition and vice versa (linear maps)."""
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))

    def f(a):
        return (window_partition_fused(a, 4) ** 2).sum()

    def f_ref(a):
        return (window_partition(a, 4)[0] ** 2).sum()

    ga = jax.grad(f)(x)
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), rtol=1e-6)

    wins, _ = window_partition(x, 4)

    def g(wn):
        return (window_unpartition_fused(wn, 4, (6, 6)) ** 3).sum()

    def g_ref(wn):
        return (window_unpartition(wn, 4, (8, 8), (6, 6)) ** 3).sum()

    gw = jax.grad(g)(wins)
    gwr = jax.grad(g_ref)(wins)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gwr), rtol=1e-6)
