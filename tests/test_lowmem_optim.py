"""Low-memory fine-tune pieces: bf16-moment AdamW + stochastic rounding.

These enable the single-chip full-scale fine-tune
(`benchmarks/train_finetune_scale.py`): the reference needs 16x8 GPUs
for the same recipe because DeepSpeed keeps f32 Adam state
(`train.py:466-487`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from grove_tpu.train.lowmem import (adamw_bf16, apply_updates_sr,
                                    scale_by_adam_compact)


def test_moments_stored_bf16():
    params = {"w": jnp.zeros((8, 8), jnp.float32)}
    tx = scale_by_adam_compact()
    state = tx.init(params)
    assert state.mu["w"].dtype == jnp.bfloat16
    assert state.nu["w"].dtype == jnp.bfloat16
    g = {"w": jnp.ones((8, 8), jnp.float32)}
    u, state = tx.update(g, state)
    assert state.mu["w"].dtype == jnp.bfloat16
    assert u["w"].dtype == jnp.float32


def test_adamw_bf16_matches_f32_adam_on_quadratic():
    """Optimize a quadratic; bf16-moment AdamW must track f32 optax.adamw
    to small relative error over 200 steps."""
    def loss(p):
        return jnp.sum((p - 3.0) ** 2) + 0.1 * jnp.sum(p ** 2)

    p0 = jnp.array([10.0, -4.0, 0.5, 7.0], jnp.float32)

    def run(tx):
        p = p0
        s = tx.init(p)

        @jax.jit
        def step(p, s):
            g = jax.grad(loss)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s

        for _ in range(200):
            p, s = step(p, s)
        return np.asarray(p)

    ref = run(optax.adamw(1e-1, b1=0.9, b2=0.95))
    got = run(adamw_bf16(1e-1, b1=0.9, b2=0.95))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    # both near the analytic optimum 3/1.1
    np.testing.assert_allclose(got, 3.0 / 1.1, rtol=5e-2)


def test_stochastic_rounding_unbiased_and_accumulates():
    """SR into bf16: (a) E[rounded] == exact value; (b) a sub-LSB update
    applied repeatedly moves the param (round-to-nearest would freeze)."""
    p = {"w": jnp.full((2048,), 1.0, jnp.bfloat16)}
    # 1 ulp of bf16 at 1.0 is 2^-8 = 0.0039; use a 1/8-ulp update
    u = {"w": jnp.full((2048,), 2.0 ** -11, jnp.float32)}

    new = apply_updates_sr(p, u, jax.random.PRNGKey(0))
    assert new["w"].dtype == jnp.bfloat16
    mean = float(np.asarray(new["w"], np.float32).mean())
    # unbiased: mean over 2048 lanes ~ 1 + 2^-11 (each lane is 1.0 or
    # 1.0039; fraction moving up ~ 1/8)
    np.testing.assert_allclose(mean, 1.0 + 2.0 ** -11, rtol=0, atol=2e-4)

    # plain cast would freeze forever:
    frozen = (p["w"] + u["w"].astype(jnp.bfloat16)).astype(jnp.bfloat16)
    assert float(np.abs(np.asarray(frozen, np.float32) - 1.0).max()) == 0.0

    # accumulation: 64 SR steps of 2^-11 should advance ~ 64*2^-11
    q = p
    key = jax.random.PRNGKey(1)
    for i in range(64):
        key, k = jax.random.split(key)
        q = apply_updates_sr(q, u, k)
    mean = float(np.asarray(q["w"], np.float32).mean())
    np.testing.assert_allclose(mean, 1.0 + 64 * 2.0 ** -11, rtol=0.15)


def test_sr_negative_and_f32_passthrough():
    p = {"a": jnp.full((1024,), -2.0, jnp.bfloat16),
         "b": jnp.full((4,), 5.0, jnp.float32)}
    u = {"a": jnp.full((1024,), -2.0 ** -10, jnp.float32),
         "b": jnp.full((4,), 0.5, jnp.float32)}
    new = apply_updates_sr(p, u, jax.random.PRNGKey(2))
    mean_a = float(np.asarray(new["a"], np.float32).mean())
    # unbiased on negatives too (1 ulp at 2.0 is 2^-7)
    np.testing.assert_allclose(mean_a, -2.0 - 2.0 ** -10, rtol=0, atol=4e-4)
    np.testing.assert_allclose(np.asarray(new["b"]), 5.5)
