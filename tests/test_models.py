"""Tiny-config model tests: shapes, finiteness, KV-cache consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.config import GroveConfig, LlamaConfig
from grove_tpu.models.grove import GroveModel, init_grove_params
from grove_tpu.models.llama import (LlamaEmbed, LlamaModel, init_kv_caches)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32, batch=2)
    return cfg, model, variables


def _tiny_batch(cfg, rng, batch=2):
    t = cfg.num_frames
    nv = cfg.num_video_tokens
    L = nv + 8
    ids = rng.integers(3, 100, size=(batch, L)).astype(np.int32)
    det = cfg.tokens.det
    # place a det token near the end, video at position 2
    ids[:, 2:2 + nv] = 0
    ids[:, L - 2] = det
    batch_d = {
        "frames_clip": rng.normal(size=(batch, t, cfg.clip.image_size,
                                        cfg.clip.image_size, 3)).astype(np.float32),
        "frames_sam": rng.normal(size=(batch, t, cfg.sam_enc.img_size,
                                       cfg.sam_enc.img_size, 3)).astype(np.float32),
        "input_ids": ids,
        "video_start": np.full((batch,), 2, np.int32),
        "labels": np.where(rng.uniform(size=(batch, L)) < 0.5, ids, -100).astype(np.int32),
        "det_positions": np.full((batch, cfg.max_phrases), L - 3, np.int32),
        "phrase_mask": np.zeros((batch, cfg.max_phrases), np.float32),
        "gt_boxes": rng.uniform(0.3, 0.6, size=(batch, t, cfg.max_phrases, 4)).astype(np.float32),
        "gt_objectness": np.ones((batch, t, cfg.max_phrases), np.float32),
    }
    batch_d["phrase_mask"][:, 0] = 1.0
    return {k: jnp.asarray(v) for k, v in batch_d.items()}


def test_forward_train_loss_finite(tiny_setup, rng):
    cfg, model, variables = tiny_setup
    batch = _tiny_batch(cfg, rng)
    out = model.apply(variables, batch, method=GroveModel.forward_train)
    for k, v in out.items():
        assert np.isfinite(float(v)), k
    assert float(out["loss"]) > 0


def test_forward_boxes_shapes(tiny_setup, rng):
    cfg, model, variables = tiny_setup
    batch = _tiny_batch(cfg, rng)
    out = model.apply(variables, batch, method=GroveModel.forward_boxes)
    b, t, p = 2, cfg.num_frames, cfg.max_phrases
    assert out["pred_boxes"].shape == (b, t, p, 4)
    assert out["objectness_logits"].shape == (b, t, p)
    bx = np.asarray(out["pred_boxes"])
    assert (bx >= 0).all() and (bx <= 1).all()


def test_video_splice_overwrites_video_positions(tiny_setup, rng):
    cfg, model, variables = tiny_setup
    nv = cfg.num_video_tokens
    b, L = 2, nv + 8
    ids = jnp.asarray(rng.integers(3, 100, size=(b, L)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(b, nv, cfg.llama.hidden_size)),
                        jnp.float32)
    start = jnp.array([2, 3], jnp.int32)
    spliced = model.apply(variables, ids, feats, start,
                          method=GroveModel._splice)
    emb = model.apply(variables, ids, feats, jnp.array([-1, -1], jnp.int32),
                      method=GroveModel._splice)
    spl = np.asarray(spliced)
    raw = np.asarray(emb)
    # video positions hold the features
    np.testing.assert_allclose(spl[0, 2:2 + nv], np.asarray(feats)[0],
                               atol=1e-6)
    np.testing.assert_allclose(spl[1, 3:3 + nv], np.asarray(feats)[1],
                               atol=1e-6)
    # positions before the splice are the raw embeddings
    np.testing.assert_allclose(spl[0, :2], raw[0, :2], atol=1e-6)
    np.testing.assert_allclose(spl[1, 3 + nv:], raw[1, 3 + nv:], atol=1e-6)


def test_kv_cache_decode_matches_full_forward(rng):
    """prefill + step-by-step decode must reproduce the full-seq hidden."""
    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg, dtype=jnp.float32)
    B, L = 2, 12
    x = jnp.asarray(rng.normal(size=(B, L, cfg.hidden_size)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    variables = model.init(jax.random.PRNGKey(0), x, positions)
    full_hidden, _ = model.apply(variables, x, positions)

    caches = init_kv_caches(cfg, B, L, dtype=jnp.float32)
    prefix = 7
    h, caches = model.apply(variables, x[:, :prefix], positions[:, :prefix],
                            kv_caches=caches, cache_offset=0)
    np.testing.assert_allclose(np.asarray(h), np.asarray(full_hidden[:, :prefix]),
                               rtol=2e-4, atol=2e-5)
    for i in range(prefix, L):
        h, caches = model.apply(variables, x[:, i:i + 1],
                                positions[:, i:i + 1],
                                kv_caches=caches, cache_offset=i)
        np.testing.assert_allclose(
            np.asarray(h[:, 0]), np.asarray(full_hidden[:, i]),
            rtol=2e-4, atol=2e-5, err_msg=f"step {i}")


def test_gqa_kv_cache_decode_matches_full_forward(rng):
    """Grouped-query attention (num_kv_heads < num_heads) through both the
    pure-self-attention path and the cache decode path."""
    import dataclasses
    cfg = dataclasses.replace(LlamaConfig.tiny(), num_kv_heads=2)
    assert cfg.num_kv_heads < cfg.num_heads
    model = LlamaModel(cfg, dtype=jnp.float32)
    B, L = 2, 10
    x = jnp.asarray(rng.normal(size=(B, L, cfg.hidden_size)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    variables = model.init(jax.random.PRNGKey(0), x, positions)
    full_hidden, _ = model.apply(variables, x, positions)

    caches = init_kv_caches(cfg, B, L, dtype=jnp.float32)
    prefix = 6
    h, caches = model.apply(variables, x[:, :prefix], positions[:, :prefix],
                            kv_caches=caches, cache_offset=0)
    np.testing.assert_allclose(np.asarray(h),
                               np.asarray(full_hidden[:, :prefix]),
                               rtol=2e-4, atol=2e-5)
    for i in range(prefix, L):
        h, caches = model.apply(variables, x[:, i:i + 1],
                                positions[:, i:i + 1],
                                kv_caches=caches, cache_offset=i)
        np.testing.assert_allclose(
            np.asarray(h[:, 0]), np.asarray(full_hidden[:, i]),
            rtol=2e-4, atol=2e-5, err_msg=f"step {i}")


def test_left_padded_prefill_matches_unpadded(rng):
    """pad_lens masking: a LEFT-padded prefill reproduces the unpadded
    hidden states at every real position (pad rows attend only themselves
    so they stay finite and never leak through later layers' k/v)."""
    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg, dtype=jnp.float32)
    L, pad = 9, 4
    x = jnp.asarray(rng.normal(size=(1, L, cfg.hidden_size)), jnp.float32)
    positions = jnp.arange(L)[None]
    variables = model.init(jax.random.PRNGKey(0), x, positions)

    caches = init_kv_caches(cfg, 1, L, dtype=jnp.float32)
    h_ref, _ = model.apply(variables, x, positions, kv_caches=caches,
                           cache_offset=0)

    x_pad = jnp.concatenate(
        [jnp.zeros((1, pad, cfg.hidden_size), jnp.float32), x], axis=1)
    pos_pad = jnp.maximum(jnp.arange(L + pad)[None] - pad, 0)
    caches_p = init_kv_caches(cfg, 1, L + pad, dtype=jnp.float32)
    h_pad, _ = model.apply(variables, x_pad, pos_pad, kv_caches=caches_p,
                           cache_offset=0,
                           pad_lens=jnp.asarray([pad], jnp.int32))
    assert np.isfinite(np.asarray(h_pad)).all()
    np.testing.assert_allclose(np.asarray(h_pad[:, pad:]),
                               np.asarray(h_ref), rtol=2e-4, atol=2e-5)


def test_segment_promptable_masks(tiny_setup, rng):
    """Legacy SAM mask path: point/box prompts -> mask logits + IoU."""
    cfg, model, variables = tiny_setup
    g = cfg.sam_dec.image_embedding_size
    c = cfg.sam_dec.embed_dim
    emb = jnp.asarray(rng.normal(size=(2, g * g, c)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, 16, size=(2, 1, 2)).astype(np.float32))
    lbl = jnp.ones((2, 1), jnp.int32)
    masks, iou = model.apply(variables, emb, points=pts, point_labels=lbl,
                             method=GroveModel.segment)
    assert masks.shape == (2, 1, 4 * g, 4 * g)
    assert iou.shape == (2, 1)
    masks3, iou3 = model.apply(variables, emb, points=pts, point_labels=lbl,
                               multimask_output=True,
                               method=GroveModel.segment)
    assert masks3.shape == (2, cfg.sam_dec.num_mask_tokens - 1, 4 * g, 4 * g)
    assert np.isfinite(np.asarray(masks)).all()


@pytest.mark.slow
def test_clip_adapter_grads_gated_by_flag(rng):
    """cfg.train_clip_adapters lifts the reference's @torch.no_grad quirk
    (`clip_encoder.py:55`): adapter grads must be nonzero with the flag
    and exactly zero without (the freeze-policy mask otherwise lies)."""
    import dataclasses
    import re

    base = GroveConfig.tiny()
    batch = None
    grads_by_flag = {}
    for flag in (False, True):
        cfg = dataclasses.replace(base, train_clip_adapters=flag)
        model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                             dtype=jnp.float32, batch=2)
        if batch is None:
            batch = _tiny_batch(cfg, rng)

        def loss_fn(params):
            out = model.apply({"params": params}, batch,
                              method=GroveModel.forward_train)
            return out["loss"]

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        adapter = [(jax.tree_util.keystr(path), g) for path, g in flat
                   if re.search(r"vision_tower.*adapters_\d+",
                                jax.tree_util.keystr(path))]
        assert adapter, "no CLIP adapter params found"
        grads_by_flag[flag] = adapter

    for name, g in grads_by_flag[False]:
        assert float(jnp.abs(g).max()) == 0.0, name
    total = sum(float(jnp.abs(g).sum()) for _, g in grads_by_flag[True])
    assert total > 0.0, "flag did not unlock CLIP adapter gradients"
