"""W8A8 serving mode: dynamic activation quant + int8 MXU dots (SAM)."""

import jax
import jax.numpy as jnp
import numpy as np

from grove_tpu.config import SamEncoderConfig
from grove_tpu.models.layers import Int8Dense
from grove_tpu.models.sam_encoder import SamImageEncoder
from grove_tpu.ops.quant import SAM_QUANT_PATTERNS, quantize_sam_tree


def test_int8dense_act_quant_exact_on_int_grid(rng):
    """With integer-valued activations whose absmax is 127 and an
    integer kernel, both quantizations are exact, so W8A8 must equal the
    float product exactly (f32 accumulation below 2^24)."""
    x = jnp.asarray(rng.integers(-127, 128, size=(2, 5, 16))
                    .astype(np.float32))
    x = x.at[:, :, 0].set(127.0)          # pin per-token absmax scale to 1
    kern = rng.integers(-127, 128, size=(16, 8)).astype(np.float32)

    mod = Int8Dense(8, dtype=jnp.float32, use_bias=True, act_quant=True)
    params = {"params": {
        "kernel_q": jnp.asarray(kern.astype(np.int8)),
        "scale": jnp.ones((8,), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
    }}
    got = np.asarray(mod.apply(params, x))
    want = np.asarray(x) @ kern + np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_int8dense_act_quant_close_on_random(rng):
    """Random floats: W8A8 output within the expected quantization noise
    of the float product."""
    x = jnp.asarray(rng.normal(size=(3, 7, 32)).astype(np.float32))
    kern = rng.normal(size=(32, 16)).astype(np.float32)
    from grove_tpu.ops.quant import quantize_kernel
    kq, ks = quantize_kernel(kern)

    mod = Int8Dense(16, dtype=jnp.float32, act_quant=True)
    params = {"params": {"kernel_q": jnp.asarray(kq),
                         "scale": jnp.asarray(ks)}}
    got = np.asarray(mod.apply(params, x))
    want = np.asarray(x) @ kern
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


def test_sam_tree_quantization_and_forward(rng):
    """quantize_sam_tree swaps exactly the block Dense kernels; the W8A8
    encoder forward stays close to the bf16-path forward."""
    cfg = SamEncoderConfig.tiny()
    enc = SamImageEncoder(cfg=cfg, dtype=jnp.float32)
    frames = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3))
                         .astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), frames)
    # non-trivial weights: zero-init kernels would make quantization moot
    variables = jax.tree.map(
        lambda x: x + 0.05 * jnp.asarray(
            np.random.default_rng(1).normal(size=x.shape), x.dtype),
        variables)
    want = np.asarray(enc.apply(variables, frames))

    pq = quantize_sam_tree(variables["params"])
    blk = pq["blocks_0"]
    assert set(blk["attn"]["qkv"].keys()) == {"kernel_q", "scale", "bias"}
    assert blk["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert set(blk["mlp"]["lin1"].keys()) == {"kernel_q", "scale", "bias"}
    # patchify/neck/norms untouched
    assert "kernel" in pq["patch_embed"]
    assert "kernel" in pq["neck_conv1"]
    assert "scale" in blk["norm1"]

    qcfg = SamEncoderConfig.tiny()
    qcfg = type(qcfg)(**{**qcfg.__dict__, "quant_w8a8": True})
    qenc = SamImageEncoder(cfg=qcfg, dtype=jnp.float32)
    got = np.asarray(qenc.apply({"params": pq}, frames))
    assert got.shape == want.shape
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    assert rel < 0.06, rel


def test_clip_tree_quantization_and_forward(rng):
    """W8A8 CLIP tower forward stays close to the bf16-path forward and
    keeps the mlvl region taps."""
    from grove_tpu.config import ClipVisionConfig
    from grove_tpu.models.clip import ClipVisionTower
    from grove_tpu.ops.quant import quantize_clip_tree

    cfg = ClipVisionConfig.tiny()
    tower = ClipVisionTower(cfg=cfg, dtype=jnp.float32, pool_thw=(2, 1, 2),
                            num_region_levels=1)
    frames = jnp.asarray(rng.normal(size=(1, 2, 28, 28, 3))
                         .astype(np.float32))
    variables = tower.init(jax.random.PRNGKey(0), frames)
    variables = jax.tree.map(
        lambda x: x + 0.05 * jnp.asarray(
            np.random.default_rng(2).normal(size=x.shape), x.dtype),
        variables)
    want_tok, want_mlvl = tower.apply(variables, frames)

    pq = quantize_clip_tree(variables["params"])
    lyr = pq["layers_0"]
    assert lyr["self_attn"]["q_proj"]["kernel_q"].dtype == jnp.int8
    assert lyr["fc1"]["kernel_q"].dtype == jnp.int8
    assert "kernel" in pq["patch_embedding"]

    qcfg = ClipVisionConfig.tiny()
    qcfg = type(qcfg)(**{**qcfg.__dict__, "quant_w8a8": True})
    qtower = ClipVisionTower(cfg=qcfg, dtype=jnp.float32,
                             pool_thw=(2, 1, 2), num_region_levels=1)
    got_tok, got_mlvl = qtower.apply({"params": pq}, frames)
    rel = (np.linalg.norm(np.asarray(got_tok) - np.asarray(want_tok))
           / max(np.linalg.norm(np.asarray(want_tok)), 1e-9))
    assert rel < 0.06, rel
    assert len(got_mlvl) == len(want_mlvl)


def test_api_quantize_vision(rng):
    """GroveForCausalLM.quantize(vision=True) quantizes LLM + both
    towers and still runs the processor round trip."""
    from grove_tpu.api.model import GroveForCausalLM
    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import init_grove_params

    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32, batch=1)
    lm = GroveForCausalLM(cfg, model, variables)
    qlm = lm.quantize(vision=True)
    pq = qlm.variables["params"]
    assert "kernel_q" in pq["llama"]["layers_0"]["self_attn"]["q_proj"]
    assert "kernel_q" in pq["vision_tower"]["layers_0"]["fc1"]
    assert "kernel_q" in pq["grounding_encoder"]["blocks_0"]["attn"]["qkv"]
    assert qlm.cfg.clip.quant_w8a8 and qlm.cfg.sam_enc.quant_w8a8
    # decoder / projector / embeddings untouched
    assert "kernel" in pq["mm_projector_0"]
    assert "embedding" in pq["embed_tokens"]


def test_conv3d_adapter_quant_close(rng):
    """int8 shifted-tap Conv3d (per-tensor act scale, shared per-channel
    kernel scale) stays close to the float conv."""
    from grove_tpu.models.layers import SpatioTemporalConvAdapter
    from grove_tpu.ops.quant import quantize_kernel

    x = jnp.asarray(rng.normal(size=(1, 2, 4, 4, 8)).astype(np.float32))
    mod = SpatioTemporalConvAdapter(dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda a: a + 0.1 * jnp.asarray(
            np.random.default_rng(4).normal(size=a.shape), a.dtype),
        variables["params"])
    want = np.asarray(mod.apply({"params": params}, x))

    kq, ks = quantize_kernel(np.asarray(params["conv3d"]["kernel"]))
    assert kq.shape == params["conv3d"]["kernel"].shape
    qparams = {"alpha": params["alpha"],
               "conv3d": {"kernel_q": jnp.asarray(kq),
                          "scale": jnp.asarray(ks),
                          "bias": params["conv3d"]["bias"]}}
    qmod = SpatioTemporalConvAdapter(dtype=jnp.float32, quant_w8a8=True)
    got = np.asarray(qmod.apply({"params": qparams}, x))
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    assert rel < 0.03, rel


def test_llama_act_quant_forward_close(rng):
    """W8A8 LLM (weight_quant + act_quant) logits stay close to the
    W8A16 logits on a tiny model."""
    import dataclasses

    from grove_tpu.config import LlamaConfig
    from grove_tpu.models.llama import LlamaModel
    from grove_tpu.ops.quant import quantize_tree

    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 12, cfg.hidden_size))
                    .astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(12), (2, 12))
    variables = model.init(jax.random.PRNGKey(0), x, pos)
    variables = jax.tree.map(
        lambda a: a + 0.05 * jnp.asarray(
            np.random.default_rng(3).normal(size=a.shape), a.dtype),
        variables)

    patterns = (r"layers_\d+/self_attn/(q|k|v|o)_proj$",
                r"layers_\d+/mlp/(gate|up|down)_proj$")
    pq = quantize_tree(variables["params"], patterns)
    qcfg = dataclasses.replace(cfg, weight_quant=True)
    w8a16 = LlamaModel(qcfg, dtype=jnp.float32)
    want = np.asarray(w8a16.apply({"params": pq}, x, pos)[0])

    aqcfg = dataclasses.replace(cfg, weight_quant=True, act_quant=True)
    w8a8 = LlamaModel(aqcfg, dtype=jnp.float32)
    got = np.asarray(w8a8.apply({"params": pq}, x, pos)[0])
    assert got.shape == want.shape
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    assert rel < 0.05, rel


def test_sam_patterns_do_not_match_llama_paths():
    import re
    llama_paths = ["llama/layers_0/self_attn/q_proj",
                   "llama/layers_0/mlp/gate_proj", "lm_head/lm_head"]
    for p in SAM_QUANT_PATTERNS:
        for path in llama_paths:
            assert not re.search(p, path)
