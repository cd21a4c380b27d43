"""Pipeline-parallel LLM stack: parity with the sequential decoder.

GPipe schedule over a "pipe" mesh axis (parallel/pipeline.py) must be a
pure re-scheduling: identical forward numerics and gradients vs
`LlamaModel.apply` on the same parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

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


def test_pipelined_full_train_step_matches_sequential():
    """The FULL training step (encoders + splice + pipelined LLM + ground
    + losses + optimizer update) reproduces the sequential step."""
    import importlib.util
    import os

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import init_grove_params
    from grove_tpu.parallel.pipeline import make_pipe_mesh
    from grove_tpu.train.step import (OptimizerConfig, make_optimizer,
                                      make_pipelined_train_step,
                                      make_train_step, partition_params,
                                      trainable_mask)

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32, batch=4)
    params = variables["params"]
    rng = np.random.default_rng(0)
    batch = mod._dummy_batch(cfg, 4, rng)

    opt_cfg = OptimizerConfig(total_steps=10, warmup_steps=2, full_llm=True)
    opt = make_optimizer(params, opt_cfg)
    mask = trainable_mask(params, opt_cfg)
    trainable, frozen = partition_params(params, mask)
    opt_state = opt.init(trainable)

    t_ref, _, m_ref = jax.jit(make_train_step(model, opt))(
        trainable, frozen, opt_state, batch)
    pipe = make_pipe_mesh(2)
    t_pp, _, m_pp = jax.jit(make_pipelined_train_step(model, opt, pipe, 2))(
        trainable, frozen, opt_state, batch)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_pp["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(t_ref), jax.tree.leaves(t_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipelined_remat_grads_match(setup):
    """remat=True recomputes activations in the backward pass; grads must
    agree with the stored-activation path up to recompute-order noise."""
    cfg, model, params, x, positions = setup
    mesh = make_pipe_mesh(2)

    def loss(p, h, remat):
        return jnp.sum(pipelined_llama_forward(
            cfg, p, h, positions, mesh, 2, dtype=jnp.float32,
            remat=remat) ** 2)

    g0 = jax.jit(jax.grad(lambda p, h: loss(p, h, False)))(params, x)
    g1 = jax.jit(jax.grad(lambda p, h: loss(p, h, True)))(params, x)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pipelined_step_honors_sam_valid_hw():
    """Real batches carry uint8 SAM frames + sam_valid_hw (pad-region
    re-zeroing); the pipelined step must produce the sequential step's
    loss on such a batch, not just on float fixtures."""
    import importlib.util
    import os

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import init_grove_params
    from grove_tpu.parallel.pipeline import make_pipe_mesh
    from grove_tpu.train.step import (OptimizerConfig, make_optimizer,
                                      make_pipelined_train_step,
                                      make_train_step, partition_params,
                                      trainable_mask)

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32, batch=2)
    params = variables["params"]
    rng2 = np.random.default_rng(3)
    batch = mod._dummy_batch(cfg, 2, rng2)
    # uint8 SAM frames with a non-trivial valid region per sample
    batch["frames_sam"] = jnp.asarray(
        rng2.integers(0, 256, size=(2, cfg.num_frames,
                                    cfg.sam_enc.img_size,
                                    cfg.sam_enc.img_size, 3)), jnp.uint8)
    batch["sam_valid_hw"] = jnp.asarray(
        [[cfg.sam_enc.img_size, cfg.sam_enc.img_size // 2],
         [cfg.sam_enc.img_size // 2, cfg.sam_enc.img_size]], jnp.int32)

    opt_cfg = OptimizerConfig(total_steps=10, warmup_steps=2)
    opt = make_optimizer(params, opt_cfg)
    mask = trainable_mask(params, opt_cfg)
    trainable, frozen = partition_params(params, mask)
    opt_state = opt.init(trainable)

    _, _, m_ref = jax.jit(make_train_step(model, opt))(
        trainable, frozen, opt_state, batch)
    pipe = make_pipe_mesh(2)
    _, _, m_pp = jax.jit(make_pipelined_train_step(model, opt, pipe, 2))(
        trainable, frozen, opt_state, batch)
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_pp["loss"]),
                               rtol=1e-6)
