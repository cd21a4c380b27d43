"""int8 KV cache: fused decode kernel vs oracle, and end-to-end decode.

The quantized cache is a memory feature (about half the HBM of bf16); the
tests pin (a) kernel numerics against the dequantize-then-attend oracle,
(b) greedy token parity with the full-precision cache on a tiny model,
(c) the left-padded ragged-batch path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grove_tpu.config import GroveConfig
from grove_tpu.infer.generate import greedy_decode, left_pad_prompts
from grove_tpu.models.grove import init_grove_params
from grove_tpu.models.llama import init_kv_caches
from grove_tpu.ops.decode_attention import (decode_attention_reference,
                                            int8_cache_decode_attention)


def _rand_cache(rng, b, hkv, d, c):
    kt = jnp.asarray(rng.integers(-127, 128, size=(b, hkv, c, d)), jnp.int8)
    vt = jnp.asarray(rng.integers(-127, 128, size=(b, hkv, c, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, size=(b, hkv, c)),
                     jnp.bfloat16)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, size=(b, hkv, c)),
                     jnp.bfloat16)
    return kt, vt, ks, vs


@pytest.mark.parametrize("h,hkv", [(4, 4), (4, 2), (8, 2)])
def test_kernel_matches_oracle(rng, h, hkv):
    b, d, c = 2, 64, 256
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    kt, vt, ks, vs = _rand_cache(rng, b, hkv, d, c)
    bias = np.zeros((b, c), np.float32)
    bias[0, 180:] = -1e9
    bias[1, 100:] = -1e9
    bias = jnp.asarray(bias)
    out = int8_cache_decode_attention(q, kt, vt, ks, vs, bias)
    ref = decode_attention_reference(q, kt, vt, ks, vs, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-2)


def test_int8_cache_layout_padded():
    cfg = GroveConfig.tiny().llama
    caches = init_kv_caches(cfg, batch=2, max_len=200, dtype=jnp.int8)
    assert caches[0]["k"].shape == (2, cfg.num_kv_heads, 256, cfg.head_dim)
    assert caches[0]["k"].dtype == jnp.int8
    assert caches[0]["k_s"].shape == (2, cfg.num_kv_heads, 256)


def test_int8_greedy_matches_fp32_cache(rng):
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32, batch=1)
    nv = cfg.num_video_tokens
    ids = rng.integers(3, 100, size=(2, nv + 6)).astype(np.int32)
    ids[:, 0] = cfg.tokens.bos
    ids[:, 2:2 + nv] = 0
    vs = np.full((2,), 2, np.int32)
    feats = rng.normal(size=(2, nv, cfg.llama.hidden_size)).astype(np.float32)
    kw = dict(max_new_tokens=8, eos_id=cfg.tokens.eos)
    g32, h32 = greedy_decode(model, variables, jnp.asarray(ids),
                             jnp.asarray(feats), jnp.asarray(vs),
                             cache_dtype=jnp.float32, **kw)
    g8, h8 = greedy_decode(model, variables, jnp.asarray(ids),
                           jnp.asarray(feats), jnp.asarray(vs),
                           cache_dtype=jnp.int8, **kw)
    assert np.asarray(g32).tolist() == np.asarray(g8).tolist()
    rel = float(jnp.linalg.norm(h8 - h32) / jnp.linalg.norm(h32))
    assert rel < 0.02, rel


def test_int8_left_padded_matches_per_sample(rng):
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32, batch=1)
    nv = cfg.num_video_tokens
    base = rng.integers(3, 100, size=(nv + 8,)).astype(np.int32)
    base[0] = cfg.tokens.bos
    base[2:2 + nv] = 0
    prompts = [base.tolist(), base[: nv + 5].tolist()]
    pids, pvs, plens = left_pad_prompts(prompts, [2, 2])
    feats = rng.normal(size=(2, nv, cfg.llama.hidden_size)).astype(np.float32)
    gb, _ = greedy_decode(model, variables, jnp.asarray(pids),
                          jnp.asarray(feats), jnp.asarray(pvs),
                          max_new_tokens=5, eos_id=cfg.tokens.eos,
                          cache_dtype=jnp.int8, pad_lens=plens)
    for i, p in enumerate(prompts):
        gi, _ = greedy_decode(model, variables,
                              jnp.asarray([p], np.int32),
                              jnp.asarray(feats[i:i + 1]),
                              jnp.asarray([2], np.int32), max_new_tokens=5,
                              eos_id=cfg.tokens.eos, cache_dtype=jnp.int8)
        assert np.asarray(gb)[i].tolist() == np.asarray(gi)[0].tolist(), i


def test_int8_cache_decode_batch_gt1_no_padlens(rng):
    """Regression: decode_step with an int8 cache at batch>1 and no
    pad_lens built a (1, C) bias the kernel rejects."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from grove_tpu.config import LlamaConfig
    from grove_tpu.models.llama import LlamaModel, init_kv_caches

    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg, dtype=jnp.float32)
    b, L = 3, 8
    x = jnp.asarray(rng.normal(size=(b, L, cfg.hidden_size)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L)[None], (b, L))
    params = model.init(jax.random.PRNGKey(0), x, pos)["params"]

    caches8 = init_kv_caches(cfg, b, L + 4, jnp.int8)
    _, c8 = model.apply({"params": params}, x, pos, kv_caches=caches8,
                        cache_offset=0)
    tok = x[:, :1]
    tpos = jnp.full((b, 1), L, jnp.int32)
    out8, _ = model.apply({"params": params}, tok, tpos, kv_caches=c8,
                          cache_offset=L)

    caches = init_kv_caches(cfg, b, L + 4, jnp.float32)
    _, cf = model.apply({"params": params}, x, pos, kv_caches=caches,
                        cache_offset=0)
    outf, _ = model.apply({"params": params}, tok, tpos, kv_caches=cf,
                          cache_offset=L)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(outf),
                               rtol=0.1, atol=0.05)   # int8 cache noise
