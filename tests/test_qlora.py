"""QLoRA-style training: quantized frozen base + trainable LoRA/adapters.

The single-chip full-scale fine-tune (`benchmarks/train_finetune_scale.py`)
relies on gradients flowing THROUGH the quantized frozen projections into
LoRA deltas and upstream adapters. These tests pin that on the tiny config:
the quantized forward is differentiable w.r.t. activations, frozen int
params get no updates, and the low-memory update path (bf16 moments +
stochastic rounding) trains end-to-end.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy

from grove_tpu.config import GroveConfig
from grove_tpu.models.grove import GroveModel, init_grove_params
from grove_tpu.train.lowmem import apply_updates_sr
from grove_tpu.train.step import (OptimizerConfig, combine_params,
                                  make_optimizer, partition_params,
                                  trainable_mask)


def _batch(cfg, b, rng):
    t, nv = cfg.num_frames, cfg.num_video_tokens
    L = nv + 16
    ids = rng.integers(3, 100, size=(b, L)).astype(np.int32)
    ids[:, 0] = cfg.tokens.bos
    ids[:, 2:2 + nv] = 0
    ids[:, L - 2] = cfg.tokens.det
    labels = ids.copy()
    labels[:, :2 + nv] = -100
    pm = np.zeros((b, cfg.max_phrases), np.float32)
    pm[:, 0] = 1.0
    return {
        "frames_clip": jnp.asarray(rng.normal(size=(
            b, t, cfg.clip.image_size, cfg.clip.image_size, 3)),
            jnp.float32),
        "frames_sam": jnp.asarray(rng.normal(size=(
            b, t, cfg.sam_enc.img_size, cfg.sam_enc.img_size, 3)),
            jnp.float32),
        "input_ids": jnp.asarray(ids),
        "video_start": jnp.full((b,), 2, jnp.int32),
        "labels": jnp.asarray(labels),
        "det_positions": jnp.asarray(
            np.full((b, cfg.max_phrases), L - 3, np.int32)),
        "phrase_mask": jnp.asarray(pm),
        "gt_boxes": jnp.asarray(rng.uniform(
            0.3, 0.6, size=(b, t, cfg.max_phrases, 4)).astype(np.float32)),
        "gt_objectness": jnp.asarray(
            (np.ones((b, t, cfg.max_phrases)) * pm[:, None]).astype(
                np.float32)),
    }


@pytest.fixture(scope="module")
def qsetup():
    # Init a REAL random bf16 model, then quantize: a directly-initialized
    # quantized tree has all-zero int kernels (placeholders), and with
    # o_proj == 0 the gradient into q/k/v is mathematically zero — the
    # grad-flow assertions below would vacuously fail.
    from grove_tpu.api.model import GroveForCausalLM
    cfg = GroveConfig.tiny()
    cfg = dataclasses.replace(cfg, llama=dataclasses.replace(
        cfg.llama, lora_r=4))
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32, batch=1)
    qlm = GroveForCausalLM(cfg, model, variables).quantize(bits=4)
    return qlm.cfg, qlm.model, qlm.variables["params"]


def test_qlora_grads_flow_and_frozen_stay(qsetup):
    cfg, model, params = qsetup
    ocfg = OptimizerConfig(total_steps=10, warmup_steps=1,
                           moment_dtype="bf16")
    mask = trainable_mask(params, ocfg)
    trainable, frozen = partition_params(params, mask)

    # int4 projections are frozen; LoRA deltas are trainable
    attn = params["llama"]["layers_0"]["self_attn"]
    assert "kernel_q4p" in attn["q_proj"]
    assert not jax.tree_util.tree_all(
        jax.tree.map(lambda _: False, trainable))  # non-empty
    tr_paths = {"/".join(str(k.key) for k in p)
                for p, v in jax.tree_util.tree_leaves_with_path(trainable)
                if v is not None}
    assert any("q_proj_lora" in p for p in tr_paths)
    assert not any("kernel_q4p" in p for p in tr_paths)

    rng = np.random.default_rng(0)
    batch = _batch(cfg, 2, rng)

    def loss_fn(tr):
        ps = combine_params(tr, frozen)
        out = model.apply({"params": ps}, batch,
                          method=GroveModel.forward_train)
        return out["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(trainable)
    assert np.isfinite(float(loss))
    # gradients REACH LoRA (through the int4 frozen projections) and the
    # tower adapters (through the whole quantized decoder)
    # zero-init LoRA: at step 0 grad_A == 0 (B is zeros); grad_B is the
    # live signal (d/dB of x@A@B sees A's random init)
    lora = grads["llama"]["layers_0"]["self_attn"]["q_proj_lora"]
    assert float(jnp.abs(lora["lora_B"]["kernel"]).max()) > 0.0
    some_adapter = grads["grounding_encoder"]["adapters_0"]
    leaves = [float(jnp.abs(g).max()) for g in jax.tree.leaves(some_adapter)]
    assert max(leaves) > 0.0


def test_qlora_lowmem_step_updates(qsetup):
    """Full low-memory update: bf16-moment AdamW + SR apply. Trainable
    params move, loss stays finite over 3 steps."""
    cfg, model, params = qsetup
    ocfg = OptimizerConfig(total_steps=10, warmup_steps=1, lr=1e-3,
                           moment_dtype="bf16")
    mask = trainable_mask(params, ocfg)
    trainable, frozen = partition_params(params, mask)
    optimizer = make_optimizer(trainable, ocfg)
    opt_state = optimizer.init(trainable)
    rng = np.random.default_rng(1)
    batch = _batch(cfg, 2, rng)

    def loss_fn(tr):
        ps = combine_params(tr, frozen)
        out = model.apply({"params": ps}, batch,
                          method=GroveModel.forward_train)
        return out["loss"]

    @jax.jit
    def step(tr, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(tr)
        updates, opt_state = optimizer.update(grads, opt_state, tr)
        key, sub = jax.random.split(key)
        tr = apply_updates_sr(tr, updates, sub)
        return tr, opt_state, key, loss

    before = jax.tree.map(lambda x: np.asarray(x) if x is not None else None,
                          trainable)
    key = jax.random.PRNGKey(0)
    losses = []
    tr = trainable
    for _ in range(3):
        tr, opt_state, key, loss = step(tr, opt_state, key)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    moved = 0
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(before),
            jax.tree_util.tree_leaves_with_path(tr)):
        if a is not None and not np.array_equal(a, np.asarray(b)):
            moved += 1
    assert moved > 0
