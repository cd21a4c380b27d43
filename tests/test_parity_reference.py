"""Numerical parity against the ACTUAL reference implementations.

These tests instantiate the real torch modules (HF LlamaForCausalLM /
CLIPVisionModel, and the reference repo's pure-torch SAM modules imported
read-only from /root/reference), export their randomly-initialized state
dicts through `checkpoint.torch_convert`, and assert the flax modules
reproduce the torch forward numerics. This is the checkpoint-parity
guarantee (SURVEY §7.4 hard part #3) validated end-to-end: naming, layout
transforms, and math all have to be right simultaneously.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def _to_numpy_sd(module, prefix=""):
    return {prefix + k: v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# LLaMA vs HF transformers
# ---------------------------------------------------------------------------

def test_llama_matches_hf(rng):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    from grove_tpu.config import GroveConfig
    from grove_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                    merge_into)
    from grove_tpu.models.grove import GroveModel, init_grove_params

    cfg = GroveConfig.tiny()
    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.llama.padded_vocab_size,
        hidden_size=cfg.llama.hidden_size,
        intermediate_size=cfg.llama.intermediate_size,
        num_hidden_layers=cfg.llama.num_layers,
        num_attention_heads=cfg.llama.num_heads,
        num_key_value_heads=cfg.llama.num_kv_heads,
        rms_norm_eps=cfg.llama.rms_norm_eps,
        rope_theta=cfg.llama.rope_theta,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    ids = rng.integers(3, 100, size=(2, 12))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()

    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32)
    converted, report = convert_state_dict(_to_numpy_sd(hf), cfg)
    assert not report["unmapped"], report["unmapped"][:8]
    params, missing, mismatched = merge_into(variables["params"], converted)
    assert not mismatched, mismatched[:5]

    dummy_video = jnp.zeros((2, cfg.num_video_tokens,
                             cfg.llama.hidden_size), jnp.float32)
    no_splice = jnp.full((2,), -1, jnp.int32)
    _, logits = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                            dummy_video, no_splice,
                            method=GroveModel.lm_forward)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3,
                               atol=2e-3)


# ---------------------------------------------------------------------------
# CLIP tower vs HF transformers (adapters are zero-gated => identity)
# ---------------------------------------------------------------------------

def test_clip_tower_matches_hf(rng):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from grove_tpu.config import GroveConfig
    from grove_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                    merge_into)
    from grove_tpu.models.grove import GroveModel, init_grove_params

    cfg = GroveConfig.tiny()
    c = cfg.clip
    hf_cfg = CLIPVisionConfig(
        hidden_size=c.hidden_size, intermediate_size=c.intermediate_size,
        num_hidden_layers=c.num_layers, num_attention_heads=c.num_heads,
        image_size=c.image_size, patch_size=c.patch_size,
        hidden_act="quick_gelu", layer_norm_eps=c.layer_norm_eps,
        attn_implementation="eager")
    torch.manual_seed(1)
    hf = CLIPVisionModel(hf_cfg).eval()

    frames = rng.normal(size=(1, c.num_frames, c.image_size, c.image_size,
                              3)).astype(np.float32)
    flat = torch.from_numpy(
        frames.reshape(-1, c.image_size, c.image_size, 3)
        .transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        hf_out = hf(flat, output_hidden_states=True)
    want = hf_out.hidden_states[c.select_layer][:, 1:].numpy()

    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                        dtype=jnp.float32)
    sd = _to_numpy_sd(hf, prefix="model.vision_tower.vision_tower.")
    converted, report = convert_state_dict(sd, cfg)
    assert not report["unmapped"], report["unmapped"][:8]
    params, _, mismatched = merge_into(variables["params"], converted)
    assert not mismatched, mismatched[:5]

    tokens, mlvl = model.apply(
        {"params": params},
        jnp.asarray(frames, jnp.float32),
        method=lambda m, f: m.clip_tower(f))
    got = np.asarray(mlvl[-1])   # = hidden_states[select_layer] patch tokens
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# SAM prompt encoder + box decoder vs the reference torch modules
# ---------------------------------------------------------------------------

def _ref_sam():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.SAM.modeling.mask_decoder import MaskDecoder
    from model.SAM.modeling.prompt_encoder import PromptEncoder
    from model.SAM.modeling.transformer import TwoWayTransformer
    from model.SAM.modeling.image_encoder import ImageEncoderViT
    return MaskDecoder, PromptEncoder, TwoWayTransformer, ImageEncoderViT


def test_sam_decoder_matches_reference(rng):
    MaskDecoder, PromptEncoder, TwoWayTransformer, _ = _ref_sam()

    from grove_tpu.config import GroveConfig
    from grove_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                    merge_into)
    from grove_tpu.models.grove import GroveModel, init_grove_params

    cfg = GroveConfig.tiny()
    d = cfg.sam_dec
    torch.manual_seed(2)
    ref_pe = PromptEncoder(
        embed_dim=d.embed_dim,
        image_embedding_size=(d.image_embedding_size,
                              d.image_embedding_size),
        input_image_size=(d.input_image_size, d.input_image_size),
        mask_in_chans=d.mask_in_chans).eval()
    ref_dec = MaskDecoder(
        transformer_dim=d.embed_dim,
        transformer=TwoWayTransformer(depth=d.depth,
                                      embedding_dim=d.embed_dim,
                                      mlp_dim=d.mlp_dim,
                                      num_heads=d.num_heads),
        decoding_type="query", use_temp_objectness=True).eval()

    # ragged reference call: 2 images, reps [2, 1] => 3 instances
    n_img, g = 2, d.image_embedding_size
    image_emb = rng.normal(size=(n_img, d.embed_dim, g, g)).astype(np.float32)
    text = rng.normal(size=(3, 1, d.embed_dim)).astype(np.float32)
    with torch.no_grad():
        sparse_t, dense_t = ref_pe(points=None, boxes=None, masks=None,
                                   text_embeds=torch.from_numpy(text))
        dense_pe_t = ref_pe.get_dense_pe()
        boxes_t, obj_t = ref_dec(
            image_embeddings=torch.from_numpy(image_emb),
            image_pe=dense_pe_t,
            sparse_prompt_embeddings=sparse_t,
            dense_prompt_embeddings=dense_t,
            multimask_output=False, reps=[2, 1])

    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32)
    sd = {}
    sd.update(_to_numpy_sd(ref_pe, "model.grounding_encoder.prompt_encoder."))
    sd.update(_to_numpy_sd(ref_dec, "model.grounding_encoder.mask_decoder."))
    converted, report = convert_state_dict(sd, cfg)
    assert not report["unmapped"], report["unmapped"][:8]
    params, _, mismatched = merge_into(variables["params"], converted)
    assert not mismatched, mismatched[:5]

    def run(m, img, txt, inst2img):
        sparse, dense = m.prompt_encoder(text_embeds=txt)
        pe = m.dense_pe()
        return m.box_decoder(img, pe, sparse, dense, inst2img)

    img_flax = jnp.asarray(
        image_emb.transpose(0, 2, 3, 1).reshape(n_img, g * g, d.embed_dim))
    boxes_j, obj_j = model.apply(
        {"params": params}, img_flax,
        jnp.asarray(text.reshape(3, 1, d.embed_dim)),
        jnp.asarray(np.array([0, 0, 1])), method=run)

    np.testing.assert_allclose(np.asarray(boxes_j), boxes_t.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(obj_j), obj_t.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_sam_encoder_matches_reference(rng):
    import dataclasses
    import functools as ft
    _, _, _, ImageEncoderViT = _ref_sam()

    from grove_tpu.config import GroveConfig, SamEncoderConfig
    from grove_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                    merge_into)
    from grove_tpu.models.sam_encoder import SamImageEncoder

    # windowed-only config: the reference adapter hardcodes (t=8, h=32)
    # rearranges, so global blocks (which trigger adapters) are excluded;
    # adapters are separately proven identity-at-init in test_models.
    enc_cfg = SamEncoderConfig(
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=4,
        out_chans=16, window_size=2, global_attn_indexes=(), num_frames=2,
        pretrain_img_size=32)
    torch.manual_seed(3)
    ref = ImageEncoderViT(
        img_size=enc_cfg.img_size, patch_size=enc_cfg.patch_size,
        in_chans=3, embed_dim=enc_cfg.embed_dim, depth=enc_cfg.depth,
        num_heads=enc_cfg.num_heads, mlp_ratio=enc_cfg.mlp_ratio,
        out_chans=enc_cfg.out_chans, qkv_bias=True,
        norm_layer=ft.partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=True, global_attn_indexes=(),
        window_size=enc_cfg.window_size).eval()

    t = enc_cfg.num_frames
    frames = rng.normal(size=(1, t, enc_cfg.img_size, enc_cfg.img_size, 3)
                        ).astype(np.float32)
    # reference forward expects (b, c, t, h, w)
    tv = torch.from_numpy(frames.transpose(0, 4, 1, 2, 3).copy())
    with torch.no_grad():
        want = ref(tv).numpy()            # (b*t, out_chans, g, g)

    cfg = dataclasses.replace(GroveConfig.tiny(), sam_enc=enc_cfg)
    enc = SamImageEncoder(enc_cfg, dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.asarray(frames, jnp.float32))
    sd = _to_numpy_sd(ref, "model.grounding_encoder.image_encoder.")
    converted, report = convert_state_dict(sd, cfg)
    assert not report["unmapped"], report["unmapped"][:8]
    # standalone encoder: its params are the grounding_encoder subtree
    params, missing, mismatched = merge_into(
        variables["params"], converted["grounding_encoder"])
    assert not missing and not mismatched, (missing[:5], mismatched[:5])

    got = np.asarray(enc.apply({"params": params},
                               jnp.asarray(frames, jnp.float32)))
    want_nhwc = want.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want_nhwc, rtol=2e-3, atol=2e-3)


def test_video_adapter_matches_reference(rng):
    """SAM SpatioTemporalConvAdapter with a NON-zero gate vs the reference
    module (validates the Conv3d layout transform beyond round-trip)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.SAM.modeling.image_encoder import (
        SpatioTemporalConvAdapter as RefAdapter)

    from grove_tpu.models.layers import SpatioTemporalConvAdapter
    from grove_tpu.checkpoint.torch_convert import _conv3d

    torch.manual_seed(4)
    c = 8
    ref = RefAdapter(c, c, (3, 3, 3)).eval()
    with torch.no_grad():
        ref.alpha.fill_(0.7)          # non-trivial gate

    # reference hardcodes t=8, h=32 in its rearranges
    t, g = 8, 32
    x = rng.normal(size=(1, t, g, g, c)).astype(np.float32)
    # reference input layout: ((b t), h, w, c)
    xt = torch.from_numpy(x.reshape(t, g, g, c))
    with torch.no_grad():
        want = ref(xt).numpy().reshape(1, t, g, g, c)

    mod = SpatioTemporalConvAdapter(dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "conv3d": {"kernel": _conv3d(ref.conv3d.weight.detach().numpy()),
                   "bias": ref.conv3d.bias.detach().numpy()},
        "alpha": np.array([0.7], np.float32),
    }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
