"""Weight-only int8 LLM quantization: numerics, structure, byte savings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.api.model import GroveForCausalLM
from grove_tpu.config import GroveConfig
from grove_tpu.infer.generate import greedy_decode
from grove_tpu.models.grove import GroveModel, init_grove_params
from grove_tpu.ops.quant import (quantize_kernel, quantize_llama_tree,
                                 tree_bytes)


@pytest.fixture(scope="module")
def setup():
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32, batch=1)
    lm = GroveForCausalLM(cfg, model, variables)
    return cfg, lm, lm.quantize()


def test_quantize_kernel_roundtrip(rng):
    k = rng.normal(size=(64, 32)).astype(np.float32)
    q, s = quantize_kernel(k)
    assert q.dtype == np.int8 and s.shape == (32,)
    deq = q.astype(np.float32) * s[None, :]
    rel = np.linalg.norm(deq - k) / np.linalg.norm(k)
    assert rel < 0.01, rel
    # extreme channel scales are handled per-channel
    k[:, 0] *= 1000
    q, s = quantize_kernel(k)
    deq = q.astype(np.float32) * s[None, :]
    assert np.linalg.norm(deq[:, 0] - k[:, 0]) / \
        np.linalg.norm(k[:, 0]) < 0.01


def test_quantized_tree_structure_and_bytes(setup):
    cfg, lm, qlm = setup
    pq = qlm.variables["params"]
    attn = pq["llama"]["layers_0"]["self_attn"]["q_proj"]
    assert set(attn.keys()) == {"kernel_q", "scale"}
    assert attn["kernel_q"].dtype == jnp.int8
    # lm_head quantized; embeddings and norms untouched
    assert "kernel_q" in pq["lm_head"]["lm_head"]
    assert "embedding" in pq["embed_tokens"]
    assert "weight" in pq["llama"]["norm"]
    # vision towers untouched
    assert "kernel_q" not in str(jax.tree_util.tree_structure(
        pq["vision_tower"]))
    b_f = tree_bytes(lm.variables["params"]["llama"])
    b_q = tree_bytes(pq["llama"])
    assert b_q < 0.5 * b_f  # f32 fixture: int8 cuts >4x on dense kernels


def test_quantized_forward_close(setup, rng):
    """Teacher-forced logits within ~2% — the W8A16 numerics gate."""
    cfg, lm, qlm = setup
    nv = cfg.num_video_tokens
    ids = rng.integers(3, 100, size=(1, nv + 6)).astype(np.int32)
    ids[:, 0] = cfg.tokens.bos
    ids[:, 2:2 + nv] = 0
    vs = np.full((1,), 2, np.int32)
    feats = rng.normal(size=(1, nv, cfg.llama.hidden_size)).astype(
        np.float32)
    _, logits = lm.model.apply(lm.variables, jnp.asarray(ids),
                               jnp.asarray(feats), jnp.asarray(vs),
                               method=GroveModel.lm_forward)
    _, logits_q = qlm.model.apply(qlm.variables, jnp.asarray(ids),
                                  jnp.asarray(feats), jnp.asarray(vs),
                                  method=GroveModel.lm_forward)
    rel = float(jnp.linalg.norm(logits_q - logits)
                / jnp.linalg.norm(logits))
    assert rel < 0.02, rel


def test_quantized_decode_runs(setup, rng):
    """End-to-end greedy decode on the quantized model: executes, emits
    valid ids (token-exact parity is not expected — random-weight logits
    are near-tied, so ~1% quant noise legitimately flips argmax)."""
    cfg, lm, qlm = setup
    nv = cfg.num_video_tokens
    ids = rng.integers(3, 100, size=(2, nv + 6)).astype(np.int32)
    ids[:, 0] = cfg.tokens.bos
    ids[:, 2:2 + nv] = 0
    vs = np.full((2,), 2, np.int32)
    feats = rng.normal(size=(2, nv, cfg.llama.hidden_size)).astype(
        np.float32)
    g, h = greedy_decode(qlm.model, qlm.variables, jnp.asarray(ids),
                         jnp.asarray(feats), jnp.asarray(vs),
                         max_new_tokens=6, eos_id=cfg.tokens.eos,
                         cache_dtype=jnp.float32)
    g = np.asarray(g)
    assert g.shape == (2, 6)
    assert (g >= 0).all() and (g < cfg.llama.padded_vocab_size).all()
    assert np.isfinite(np.asarray(h)).all()


def test_quantized_save_pretrained_roundtrip(setup, tmp_path):
    """HF-layout save/load preserves the quantized structure exactly:
    config.json carries llama.weight_quant and the int8 kernels + scales
    round-trip bit-for-bit."""
    _, _, qlm = setup
    d = str(tmp_path / "qmodel")
    qlm.save_pretrained(d)
    back = GroveForCausalLM.from_pretrained(d)
    assert back.cfg.llama.weight_quant is True
    for a, b in zip(jax.tree.leaves(qlm.variables["params"]),
                    jax.tree.leaves(back.variables["params"])):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
