"""SYSTEM-level numerical parity: the reference's composed `evaluate()`
pipeline vs grove_tpu's prefill/decode/ground pipeline, end to end.

`tests/test_parity_reference.py` pins each module (LLaMA, CLIP, SAM
encoder/decoder) against its torch counterpart individually. The riskiest
seams live BETWEEN the modules — the video-token splice offset, the
per-step hidden-state capture during generation, and the [DET]-mask
arithmetic (`model/GROVE.py:412-451`: generate -> per-step hidden concat
-> det gather -> text projection -> prompt/mask decoder -> boxes). This
test composes the reference's OWN torch modules at tiny scale
(GROVEForCausalLM with a size-reduced SAM grafted in), runs its real
`evaluate()` (HF greedy generate with `output_hidden_states=True`), and
asserts the jax pipeline reproduces generated token ids AND final boxes.

Scale reductions (documented, none touch the seams under test):
* SAM prompt/mask decoder built tiny via the reference's own modeling
  classes (`build_sam_vit_h` hard-codes ViT-H, so the builder is patched
  to return the same modules at `GroveConfig.tiny().sam_dec` size).
* The region encoder is stubbed (reference hard-codes 1024->4096 dims;
  its parity is covered by tests/test_region.py, and this path passes
  `bboxes=None` so it is never called — only constructed).
* CLIP/SAM towers are bypassed by injecting the SAME synthetic
  video features / grounding embeddings on both sides — exactly the
  interface `evaluate()` itself exposes (`model/GROVE.py:415-417`
  takes image_features/image_embeddings precomputed).
* pool dims set so num_video_tokens == 576: the reference hard-codes the
  575 splice offset (`model/GROVE.py:200-205,431`), so parity at any
  other video token count is untestable against its own code.
"""

import dataclasses
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def _stub_reference_deps():
    """Register import stubs for the reference's CUDA-era deps that are
    absent in this env (torchvision / mmdet / mmcv / mmengine). None of
    the stubbed symbols execute in this test: GIoU is loss-path only and
    the region encoder is replaced with Identity before construction —
    the stubs only satisfy module-top-level imports."""
    import types

    import importlib.machinery

    def mod(name, **attrs):
        m = sys.modules.get(name) or types.ModuleType(name)
        if m.__spec__ is None:
            # transformers probes importlib.util.find_spec(...), which
            # raises ValueError on a module with __spec__ == None
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    def _unused(*a, **kw):  # pragma: no cover - must never be called
        raise AssertionError("stubbed reference dep was called")

    tv = mod("torchvision")
    tv.ops = mod("torchvision.ops", generalized_box_iou_loss=_unused)
    mm = mod("mmdet")
    mm.models = mod("mmdet.models", BaseRoIExtractor=type(
        "BaseRoIExtractor", (torch.nn.Module,), {}))
    mc = mod("mmcv")
    mc.cnn = mod("mmcv.cnn", ConvModule=_unused, Linear=torch.nn.Linear)
    me = mod("mmengine")
    me.model = mod("mmengine.model", normal_init=_unused)


def _tiny_cfg():
    from grove_tpu.config import GroveConfig
    cfg = GroveConfig.tiny()
    # 576 video tokens (2*16*18) to match the reference's baked-in 575
    # splice offset; everything else stays tiny
    return dataclasses.replace(cfg, pool_t=2, pool_h=16, pool_w=18,
                               max_seq_len=640)


def _build_reference_grove(cfg):
    """The reference's own GROVEForCausalLM at tiny scale."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    _stub_reference_deps()
    import model.GROVE as ref_grove_mod
    import model.llava.llava_with_region_arch as ref_arch
    from model.llava.model.language_model.llava_llama import Llava1Config
    from model.SAM.modeling.mask_decoder import MaskDecoder
    from model.SAM.modeling.prompt_encoder import PromptEncoder
    from model.SAM.modeling.transformer import TwoWayTransformer

    d = cfg.sam_dec

    class TinySam(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.prompt_encoder = PromptEncoder(
                embed_dim=d.embed_dim,
                image_embedding_size=(d.image_embedding_size,
                                      d.image_embedding_size),
                input_image_size=(d.input_image_size, d.input_image_size),
                mask_in_chans=d.mask_in_chans)
            self.mask_decoder = MaskDecoder(
                transformer_dim=d.embed_dim,
                transformer=TwoWayTransformer(depth=d.depth,
                                              embedding_dim=d.embed_dim,
                                              mlp_dim=d.mlp_dim,
                                              num_heads=d.num_heads),
                decoding_type="query", use_temp_objectness=True)
            self.image_encoder = torch.nn.Identity()

    hf_cfg = Llava1Config(
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
    hf_cfg.mm_vision_select_layer = -2
    # normally carried by the checkpoint's config.json; read at
    # `llava_with_region_arch.py:116` even when bboxes is None
    hf_cfg.num_level_reg_features = 4
    hf_cfg.eos_token_id = cfg.tokens.eos
    hf_cfg.bos_token_id = cfg.tokens.bos
    hf_cfg.pad_token_id = cfg.tokens.pad

    orig_build = ref_grove_mod.build_sam_vit_h
    orig_region = ref_arch.MLVLROIQueryModule
    ref_grove_mod.build_sam_vit_h = (
        lambda ckpt, use_temp_objectness=True: TinySam())
    ref_arch.MLVLROIQueryModule = (
        lambda *a, **kw: torch.nn.Identity())
    try:
        torch.manual_seed(7)
        model = ref_grove_mod.GROVEForCausalLM(
            hf_cfg,
            det_token_idx=cfg.tokens.det,
            num_frames=cfg.num_frames,
            out_dim=cfg.out_dim,
            use_temp_objectness=True,
            temp_objectness_threshold=cfg.temp_objectness_threshold,
        ).eval()
    finally:
        ref_grove_mod.build_sam_vit_h = orig_build
        ref_arch.MLVLROIQueryModule = orig_region
    _shim_transformers_457(model)
    return model


def _shim_transformers_457(model):
    """Restore the reference's pinned transformers==4.46.3 generate
    semantics under this env's 4.57.

    The reference's `prepare_inputs_for_generation` override
    (`llava_llama.py:158-159`) decides "are we past the prefill?" with
    `if past_key_values:` — under 4.46 the first step passes
    past_key_values=None, but 4.57's generate pre-allocates a
    DynamicCache whose truthiness is version-dependent, which can slice
    the PROMPT to its last token on step 0 and silently skip the video
    splice (observed: every captured hidden state came out (1, 1, H)).
    The shim maps an empty cache to None — exactly the 4.46 contract —
    and drops the attention mask (batch-1, unpadded: the causal mask the
    model builds internally is identical; the 4.57 mask bookkeeping
    counts un-spliced positions and desyncs from the spliced stream)."""
    orig = model.prepare_inputs_for_generation

    def patched(input_ids, past_key_values=None, **kwargs):
        empty = (past_key_values is None
                 or past_key_values.get_seq_length() == 0)
        kwargs.pop("attention_mask", None)
        kwargs.pop("cache_position", None)
        out = orig(input_ids,
                   past_key_values=None if empty else past_key_values,
                   attention_mask=None, **kwargs)
        return out

    # 4.57's _validate_model_kwargs whitelists kwargs by inspecting THIS
    # method's signature (GROVE.forward is (**kwargs), so it contributes
    # nothing) — keep the original's explicit parameter list visible.
    import inspect
    patched.__signature__ = inspect.signature(orig)
    model.prepare_inputs_for_generation = patched


def test_composed_evaluate_matches_reference(rng, monkeypatch):
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from utils.utils import IMAGE_TOKEN_INDEX  # noqa: E402 (ref on path)

    # the reference hardcodes `.cuda()` on a tiny offset tensor
    # (`model/GROVE.py:260`); this env is CPU-torch — make it a no-op
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **kw: self, raising=True)

    from grove_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                    merge_into)
    from grove_tpu.infer.generate import greedy_decode
    from grove_tpu.models.grove import GroveModel, init_grove_params
    from grove_tpu.text.packing import (det_gather_positions,
                                        splice_video_tokens)

    cfg = _tiny_cfg()
    nv = cfg.num_video_tokens
    assert nv == 576, nv
    h = cfg.llama.hidden_size
    t = cfg.num_frames
    max_new = 8

    ref = _build_reference_grove(cfg)

    # --- shared synthetic inputs ------------------------------------
    # prompt: bos, 2 text tokens, <video>, text, [DET], text, [DET], text
    det = cfg.tokens.det
    ids_unspliced = np.array([cfg.tokens.bos, 11, 12, IMAGE_TOKEN_INDEX,
                              13, det, 14, det, 15], np.int64)
    video_feats = rng.normal(size=(1, nv, h)).astype(np.float32) * 0.2
    g = cfg.sam_dec.image_embedding_size
    img_emb = rng.normal(size=(t, cfg.sam_dec.embed_dim, g, g)).astype(
        np.float32) * 0.2

    # --- torch: the reference's own composed evaluate() --------------
    # image_forward_outs is only sliced for the (unused, bboxes=None)
    # region path; fabricate the minimum structure it indexes
    class Outs:
        hidden_states = [torch.zeros(1, 5, 4) for _ in range(12)]

    with torch.no_grad():
        gen_t, boxes_t, obj_t = ref.evaluate(
            torch.from_numpy(video_feats), Outs(), torch.float32,
            torch.from_numpy(img_emb),
            torch.from_numpy(ids_unspliced[None]),
            [torch.tensor([1.0, 1.0])],     # unit orig size: xyxy of
            max_tokens_new=max_new,         # normalized cxcywh
            bboxes=None, token_embeddings=None,
            dense_pe=ref.model.grounding_encoder.prompt_encoder
            .get_dense_pe(),
            device="cpu")
    gen_t = gen_t[0].numpy()

    # --- jax: convert weights, run the grove_tpu pipeline -------------
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32)
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    converted, report = convert_state_dict(sd, cfg)
    assert not report["unmapped"], report["unmapped"][:8]
    params, _, mismatched = merge_into(variables["params"], converted)
    assert not mismatched, mismatched[:5]
    variables = {"params": params}

    spliced, _, video_start = splice_video_tokens(
        ids_unspliced.tolist(), None, nv, video_fill_id=0,
        video_token_index=IMAGE_TOKEN_INDEX)
    gen_j, hidden = greedy_decode(
        model, variables, jnp.asarray(spliced[None], jnp.int32),
        jnp.asarray(video_feats), jnp.asarray([video_start], jnp.int32),
        max_new_tokens=max_new, eos_id=cfg.tokens.eos,
        pad_id=cfg.tokens.pad, cache_dtype=jnp.float32)
    gen_j = np.asarray(gen_j)[0]

    # token ids: identical greedy trajectories (stop comparing at the
    # reference's first EOS; grove pads after EOS)
    want_new = gen_t[len(ids_unspliced):]
    n_cmp = len(want_new)
    eos_hits = np.nonzero(want_new == cfg.tokens.eos)[0]
    if eos_hits.size:
        n_cmp = int(eos_hits[0]) + 1
    np.testing.assert_array_equal(gen_j[:n_cmp], want_new[:n_cmp])

    # ground: det positions over the full spliced stream (prompt DETs
    # plus any generated ones), then boxes through the converted SAM
    # prompt/mask decoder
    full = np.concatenate([spliced, gen_j.astype(np.int64)])
    det_pos, phrase_mask = det_gather_positions(full, det,
                                                cfg.max_phrases)
    img_emb_j = jnp.asarray(
        img_emb.transpose(0, 2, 3, 1).reshape(t, g * g,
                                              cfg.sam_dec.embed_dim))
    boxes_j, obj_j = model.apply(
        variables, hidden, jnp.asarray(det_pos[None], jnp.int32),
        img_emb_j, method=GroveModel.ground)
    boxes_j = np.asarray(boxes_j)[0]      # (T, P, 4) cxcywh in [0,1]
    obj_j = np.asarray(obj_j)[0]          # (T, P)

    n_det = int(phrase_mask.sum())
    assert n_det >= 2                     # the two prompt [DET]s at least
    # the reference returns ragged per-frame lists filtered by
    # objectness; apply the identical filter to the jax outputs
    from grove_tpu.ops.boxes import box_cxcywh_to_xyxy
    for fr in range(t):
        obj_ref = obj_t[0][fr].numpy().reshape(-1)          # (n_det,)
        np.testing.assert_allclose(obj_j[fr, :n_det], obj_ref,
                                   rtol=2e-3, atol=2e-3)
        keep = 1.0 / (1.0 + np.exp(-obj_ref)) > cfg.temp_objectness_threshold
        want_boxes = boxes_t[0][fr].numpy()                 # filtered xyxy
        got_boxes = np.asarray(box_cxcywh_to_xyxy(
            jnp.asarray(boxes_j[fr, :n_det][keep])))
        assert want_boxes.shape == got_boxes.shape
        np.testing.assert_allclose(got_boxes, want_boxes, rtol=2e-3,
                                   atol=2e-3)
