"""LoRA: adapters start as identity, train, and merge exactly."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from grove_tpu.config import LlamaConfig
from grove_tpu.models.llama import LlamaModel
from grove_tpu.tools.merge_lora import merge_lora_params


def _run(cfg, variables, x, positions):
    model = LlamaModel(cfg, dtype=jnp.float32)
    out, _ = model.apply(variables, x, positions)
    return np.asarray(out)


def test_lora_zero_init_is_identity(rng):
    base_cfg = LlamaConfig.tiny()
    lora_cfg = dataclasses.replace(base_cfg, lora_r=4)
    x = jnp.asarray(rng.normal(size=(1, 6, base_cfg.hidden_size)),
                    jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(6)[None], (1, 6))
    model = LlamaModel(lora_cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, positions)
    # strip lora params -> base model with identical base weights
    import flax
    params = variables["params"]

    def strip(node):
        if isinstance(node, dict):
            return {k: strip(v) for k, v in node.items()
                    if not k.endswith("_lora")}
        return node

    base_vars = {"params": strip(params)}
    out_lora = _run(lora_cfg, variables, x, positions)
    out_base = _run(base_cfg, base_vars, x, positions)
    np.testing.assert_allclose(out_lora, out_base, atol=1e-6)


def test_lora_merge_matches_adapter(rng):
    base_cfg = LlamaConfig.tiny()
    lora_cfg = dataclasses.replace(base_cfg, lora_r=4, lora_alpha=8.0)
    x = jnp.asarray(rng.normal(size=(1, 5, base_cfg.hidden_size)),
                    jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(5)[None], (1, 5))
    model = LlamaModel(lora_cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, positions)
    params = jax.tree.map(np.asarray, variables["params"])

    # give the adapters non-zero weights
    def randomize(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k.endswith("_lora"):
                    v["lora_A"]["kernel"] = rng.normal(
                        size=v["lora_A"]["kernel"].shape).astype(np.float32)
                    v["lora_B"]["kernel"] = rng.normal(
                        size=v["lora_B"]["kernel"].shape).astype(np.float32)
                else:
                    randomize(v)
    randomize(params)

    out_lora = _run(lora_cfg, {"params": params}, x, positions)
    merged = merge_lora_params(params, alpha=8.0, r=4)
    out_merged = _run(base_cfg, {"params": merged}, x, positions)
    np.testing.assert_allclose(out_lora, out_merged, rtol=2e-4, atol=2e-5)
    # adapters gone after merge
    flat = str(jax.tree_util.tree_structure(merged))
    assert "_lora" not in flat
