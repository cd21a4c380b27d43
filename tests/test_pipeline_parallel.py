"""Pipeline-parallel LLM stack: parity with the sequential decoder.

GPipe schedule over a "pipe" mesh axis (parallel/pipeline.py) must be a
pure re-scheduling: identical forward numerics and gradients vs
`LlamaModel.apply` on the same parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grove_tpu.config import LlamaConfig
from grove_tpu.models.llama import LlamaModel
from grove_tpu.parallel.pipeline import (make_pipe_mesh,
                                         pipelined_llama_forward,
                                         stack_block_params,
                                         unstack_block_params)


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig(vocab_size=128, extra_vocab_size=7, hidden_size=32,
                      intermediate_size=64, num_layers=4, num_heads=4,
                      num_kv_heads=4, max_position_embeddings=512)
    rng = np.random.default_rng(0)
    b, s = 8, 6
    x = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)), jnp.float32)
    positions = jnp.arange(s)
    model = LlamaModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, positions)["params"]
    return cfg, model, params, x, positions


def test_stack_roundtrip(setup):
    cfg, _, params, _, _ = setup
    stacked, rest = stack_block_params(params, cfg.num_layers)
    assert "norm" in rest
    back = unstack_block_params(stacked, cfg.num_layers)
    for i in range(cfg.num_layers):
        a = jax.tree.leaves(back[f"layers_{i}"])
        b = jax.tree.leaves(params[f"layers_{i}"])
        for x_, y_ in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x_), np.asarray(y_))


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 4), (4, 8),
                                              (4, 1)])
def test_pipelined_forward_matches_sequential(setup, n_stages, n_micro):
    cfg, model, params, x, positions = setup
    ref, _ = jax.jit(lambda p, h: model.apply({"params": p}, h,
                                              positions))(params, x)
    mesh = make_pipe_mesh(n_stages)
    out = jax.jit(lambda p, h: pipelined_llama_forward(
        cfg, p, h, positions, mesh, n_micro, dtype=jnp.float32))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipelined_grads_match_sequential(setup):
    cfg, model, params, x, positions = setup
    mesh = make_pipe_mesh(4)

    def loss_pp(p, h):
        return jnp.sum(pipelined_llama_forward(
            cfg, p, h, positions, mesh, 4, dtype=jnp.float32) ** 2)

    def loss_ref(p, h):
        out, _ = model.apply({"params": p}, h, positions)
        return jnp.sum(out ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params, x)
    g_ref = jax.jit(jax.grad(loss_ref))(params, x)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
