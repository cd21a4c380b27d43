"""Flash backward kernels vs XLA autodiff (interpret mode on CPU)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grove_tpu.ops.attention import xla_attention
from grove_tpu.ops.flash_backward import (flash_attention_trainable,
                                          flash_forward_lse)


def _qkv(rng, b=1, s=128, h=2, d=8):
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.normal(size=(b, s, h, d)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal", [False, True])
def test_forward_lse_matches_xla(rng, causal):
    q, k, v = _qkv(rng)
    scale = 1.0 / math.sqrt(q.shape[-1])
    out, lse = flash_forward_lse(q, k, v, causal=causal, scale=scale,
                                 block=64)
    want = xla_attention(q, k, v, causal=causal, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    # lse is the logsumexp of the scaled logits
    qn, kn = np.asarray(q), np.asarray(k)
    logits = np.einsum("bqhd,bkhd->bhqk", qn, kn) * scale
    if causal:
        s = q.shape[1]
        maskmat = np.tril(np.ones((s, s), bool))
        logits = np.where(maskmat[None, None], logits, -1e30)
    want_lse = np.log(np.exp(
        logits - logits.max(-1, keepdims=True)).sum(-1)) + \
        logits.max(-1, keepdims=True)[..., 0]
    got_lse = np.asarray(lse).reshape(1, 2, -1)
    np.testing.assert_allclose(got_lse, want_lse, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_backward_matches_autodiff(rng, causal):
    q, k, v = _qkv(rng, s=128)
    scale = 1.0 / math.sqrt(q.shape[-1])

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v, causal, scale, 64)
                       ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=causal, scale=scale)
                       ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"d{name}")
