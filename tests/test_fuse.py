"""Fused qkv/gate_up projections: parameter transform + numerics.

The fusion must be bit-identical (output columns of a matmul are
independent dot products) for bf16 AND int8-weight models, and round-trip
through unfuse back to the reference layout.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grove_tpu.config import LlamaConfig
from grove_tpu.models.fuse import (fuse_llama_projections,
                                   unfuse_llama_projections)
from grove_tpu.models.llama import LlamaModel, init_kv_caches


def _setup(fused=False, quant=False, kv_heads=4):
    cfg = dataclasses.replace(LlamaConfig.tiny(), num_kv_heads=kv_heads,
                              fused_qkv=fused, weight_quant=quant)
    model = LlamaModel(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.hidden_size),
                          jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    return cfg, model, x, pos


def test_fused_forward_bit_identical():
    cfg, model, x, pos = _setup()
    params = model.init(jax.random.PRNGKey(0), x, pos)["params"]
    ref, _ = model.apply({"params": params}, x, pos)

    fcfg = dataclasses.replace(cfg, fused_qkv=True)
    fmodel = LlamaModel(fcfg, dtype=jnp.float32)
    fparams = fuse_llama_projections(params)
    out, _ = fmodel.apply({"params": fparams}, x, pos)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_fused_decode_with_cache_matches():
    cfg, model, x, pos = _setup()
    params = model.init(jax.random.PRNGKey(0), x, pos)["params"]
    fcfg = dataclasses.replace(cfg, fused_qkv=True)
    fmodel = LlamaModel(fcfg, dtype=jnp.float32)
    fparams = fuse_llama_projections(params)

    caches = init_kv_caches(cfg, 2, 8, jnp.float32)
    h1, c1 = model.apply({"params": params}, x, pos, kv_caches=caches,
                         cache_offset=0)
    h2, c2 = fmodel.apply({"params": fparams}, x, pos, kv_caches=caches,
                          cache_offset=0)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    tok_x = x[:, :1]
    tok_pos = jnp.full((2, 1), 6, jnp.int32)
    s1, _ = model.apply({"params": params}, tok_x, tok_pos, kv_caches=c1,
                        cache_offset=6)
    s2, _ = fmodel.apply({"params": fparams}, tok_x, tok_pos, kv_caches=c2,
                         cache_offset=6)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_fused_int8_weights():
    from grove_tpu.ops.quant import quantize_llama_tree
    cfg, model, x, pos = _setup()
    params = model.init(jax.random.PRNGKey(0), x, pos)["params"]
    # quantize under the llama/ prefix the patterns expect
    qparams = quantize_llama_tree({"llama": params})["llama"]

    qcfg = dataclasses.replace(cfg, weight_quant=True)
    qmodel = LlamaModel(qcfg, dtype=jnp.float32)
    ref, _ = qmodel.apply({"params": qparams}, x, pos)

    fqcfg = dataclasses.replace(cfg, weight_quant=True, fused_qkv=True)
    fqmodel = LlamaModel(fqcfg, dtype=jnp.float32)
    fqparams = fuse_llama_projections(qparams)
    out, _ = fqmodel.apply({"params": fqparams}, x, pos)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_unfuse_round_trip():
    cfg, model, x, pos = _setup()
    params = model.init(jax.random.PRNGKey(0), x, pos)["params"]
    fused = fuse_llama_projections(params)
    back = unfuse_llama_projections(fused, cfg)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [jax.tree_util.keystr(p) for p, _ in flat_a] == \
           [jax.tree_util.keystr(p) for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fuse_idempotent():
    cfg, model, x, pos = _setup()
    params = model.init(jax.random.PRNGKey(0), x, pos)["params"]
    once = fuse_llama_projections(params)
    twice = fuse_llama_projections(once)
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(once)[0],
            jax.tree_util.tree_flatten_with_path(twice)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_api_fuse_composes_with_quantize(tmp_path):
    """GroveForCausalLM.fuse() after quantize(): decode path still runs and
    produces the same ids as the unfused model."""
    from grove_tpu.api.model import GroveForCausalLM
    from grove_tpu.infer.generate import greedy_decode

    lm = GroveForCausalLM.from_pretrained(None, model_size="tiny",
                                          dtype=jnp.float32)
    fq = lm.quantize().fuse()
    assert fq.cfg.llama.fused_qkv and fq.cfg.llama.weight_quant
    q = lm.quantize()

    rng = np.random.default_rng(0)
    nv = lm.cfg.num_video_tokens
    L = nv + 8
    ids = jnp.asarray(rng.integers(3, 100, size=(1, L)), jnp.int32)
    ve = jnp.asarray(rng.normal(size=(1, nv, lm.cfg.llama.hidden_size)),
                     jnp.float32)
    vs = jnp.zeros((1,), jnp.int32)
    gen_q, _ = greedy_decode(q.model, q.variables, ids, ve, vs,
                             max_new_tokens=6, eos_id=lm.cfg.tokens.eos,
                             early_exit=False)
    gen_fq, _ = greedy_decode(fq.model, fq.variables, ids, ve, vs,
                              max_new_tokens=6, eos_id=lm.cfg.tokens.eos,
                              early_exit=False)
    np.testing.assert_array_equal(np.asarray(gen_q), np.asarray(gen_fq))


def test_fuse_leaves_vision_towers_untouched():
    """Regression: CLIP attention also has q/k/v_proj (paired with
    out_proj, HF naming) — fusion must only touch LLaMA blocks."""
    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import init_grove_params

    cfg = GroveConfig.tiny()
    _, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32, batch=1)
    params = variables["params"]
    fused = fuse_llama_projections(params)
    # CLIP subtree byte-identical
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params["vision_tower"])[0],
            jax.tree_util.tree_flatten_with_path(fused["vision_tower"])[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # LLaMA subtree fused
    assert "qkv_proj" in fused["llama"]["layers_0"]["self_attn"]
    assert "gate_up_proj" in fused["llama"]["layers_0"]["mlp"]
    assert "q_proj" not in fused["llama"]["layers_0"]["self_attn"]
