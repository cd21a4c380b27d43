"""Fused SAM rel-pos backward vs autodiff through the XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grove_tpu.ops.sam_attention import _xla_relpos_attention
from grove_tpu.ops.sam_attention_bwd import relpos_flash_attention


def _setup(rng, b=1, gh=8, gw=8, nh=2, d=8):
    s = gh * gw
    mk = lambda shape: jnp.asarray(  # noqa: E731
        rng.normal(size=shape).astype(np.float32))
    return (mk((b, s, nh, d)), mk((b, s, nh, d)), mk((b, s, nh, d)),
            mk((2 * gh - 1, d)), mk((2 * gw - 1, d)), (gh, gw))


def test_forward_matches_xla(rng):
    q, k, v, rh, rw, hw = _setup(rng)
    out = relpos_flash_attention(q, k, v, rh, rw, hw)
    want = _xla_relpos_attention(q, k, v, rh, rw, hw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_all_gradients_match_autodiff(rng):
    q, k, v, rh, rw, hw = _setup(rng)

    def loss_fused(*a):
        return jnp.sum(relpos_flash_attention(*a, hw) ** 2)

    def loss_xla(*a):
        return jnp.sum(_xla_relpos_attention(*a, hw) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    names = ["dq", "dk", "dv", "dRh", "dRw"]
    for a, b, n in zip(g1, g2, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4, err_msg=n)


def test_larger_grid_gradients(rng):
    q, k, v, rh, rw, hw = _setup(rng, gh=16, gw=16)

    def loss_fused(*a):
        return jnp.sum(relpos_flash_attention(*a, hw) ** 2)

    def loss_xla(*a):
        return jnp.sum(_xla_relpos_attention(*a, hw) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 3))(q, k, v, rh, rw)
    g2 = jax.grad(loss_xla, argnums=(0, 3))(q, k, v, rh, rw)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4)
