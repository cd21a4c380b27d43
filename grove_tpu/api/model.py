"""GroveForCausalLM-style facade: one object bundling config+params+methods.

API-parity sugar over the functional core, mirroring
`grove_transformers.GroveForCausalLM.from_pretrained`
(`modeling_grove.py:132-155`): builds the config, loads/initializes weights
(torch `.bin` via the converter, Orbax dir, or fresh), captures special-token
ids from the tokenizer, and exposes the mode-multiplexed surface of the
reference as methods.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GroveConfig
from ..models.grove import GroveModel, init_grove_params


class GroveForCausalLM:
    def __init__(self, cfg: GroveConfig, model: GroveModel, variables):
        self.cfg = cfg
        self.model = model
        self.variables = variables

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, checkpoint: Optional[str] = None,
                        model_size: str = "full",
                        tokenizer=None, dtype=jnp.bfloat16,
                        seed: int = 0) -> "GroveForCausalLM":
        """Load from (in order of dispatch): an HF-layout model dir
        (config.json + flax_model.msgpack, as written by `save_pretrained`),
        an Orbax checkpoint dir, a torch `.bin`, or fresh-init by size."""
        cfg = None
        if checkpoint and os.path.isdir(checkpoint) and \
                os.path.exists(os.path.join(checkpoint, "config.json")):
            cfg = GroveConfig.load_json(
                os.path.join(checkpoint, "config.json"))
        if cfg is None:
            cfg = {"tiny": GroveConfig.tiny, "small": GroveConfig.small,
                   "full": GroveConfig}[model_size]()
        if tokenizer is not None:
            import dataclasses
            from ..text.tokenizer import special_token_ids_from
            cfg = dataclasses.replace(cfg,
                                      tokens=special_token_ids_from(tokenizer))
        model, variables = init_grove_params(cfg, jax.random.PRNGKey(seed),
                                             dtype=dtype)
        if checkpoint:
            msgpack = (os.path.join(checkpoint, "flax_model.msgpack")
                       if os.path.isdir(checkpoint) else None)
            if msgpack and os.path.exists(msgpack):
                from flax import serialization
                with open(msgpack, "rb") as f:
                    params = serialization.from_bytes(
                        variables["params"], f.read())
                variables = {"params": jax.tree_util.tree_map(
                    lambda t, x: jnp.asarray(x, t.dtype),
                    variables["params"], params)}
            elif os.path.isdir(checkpoint):
                from ..checkpoint.orbax_io import CheckpointManager
                mgr = CheckpointManager(checkpoint)
                restored = (mgr.restore_best({"params": variables["params"]})
                            or mgr.restore(
                                template={"params": variables["params"],
                                          "opt_state": None}))
                if restored:
                    variables = {"params": restored["params"]}
            else:
                import torch
                from ..checkpoint.torch_convert import (convert_state_dict,
                                                        merge_into)
                from ..tools.merge_lora import normalize_peft_state_dict
                sd = torch.load(checkpoint, map_location="cpu")
                sd = {k: v.float().numpy() for k, v in sd.items()
                      if hasattr(v, "numpy")}
                sd = normalize_peft_state_dict(sd)
                converted, _ = convert_state_dict(sd, cfg)
                params, _, _ = merge_into(variables["params"], converted)
                variables = {"params": params}
        return cls(cfg, model, variables)

    def quantize(self, vision: bool = False, bits: int = 8,
                 act_quant: bool = False) -> "GroveForCausalLM":
        """int8/int4 serving variant. Always: LLM Dense kernels stored
        quantized (bits=8: per-channel int8 W8A16, see ops/quant.py —
        halves LLM weight HBM so the full model fits a single v5e chip;
        bits=4: group-128 int4 projections + int8 lm_head — halves the
        weight bytes AGAIN, speeding the weight-read-bound decode step,
        at GPTQ-class quantization noise). With `vision=True`:
        additionally W8A8-quantize the CLIP and SAM encoder towers (int8
        weights AND dynamic int8 activations — the towers are
        compute-bound and int8 MXU dots run 2x bf16 on v5e). With
        `act_quant=True`: LLM multi-token activations quantize
        dynamically too (prefill rides the int8 MXU path — measured
        257 TF/s effective vs the 197 bf16 peak; single-token decode
        stays on the weight-read-bound path either way).
        Returns a NEW instance; the original stays usable."""
        import dataclasses

        from ..models.grove import GroveModel
        from ..ops.quant import (quantize_clip_tree, quantize_llama_tree,
                                 quantize_llama_tree_int4,
                                 quantize_sam_tree)

        assert bits in (8, 4), bits
        cfg = dataclasses.replace(
            self.cfg, llama=dataclasses.replace(self.cfg.llama,
                                                weight_quant=True,
                                                weight_quant_bits=bits,
                                                act_quant=act_quant))
        if bits == 4:
            params = quantize_llama_tree_int4(
                self.variables["params"], group=cfg.llama.quant_group)
        else:
            params = quantize_llama_tree(self.variables["params"])
        if vision:
            cfg = dataclasses.replace(
                cfg,
                clip=dataclasses.replace(cfg.clip, quant_w8a8=True),
                sam_enc=dataclasses.replace(cfg.sam_enc, quant_w8a8=True))
            params["vision_tower"] = quantize_clip_tree(
                params["vision_tower"])
            params["grounding_encoder"] = quantize_sam_tree(
                params["grounding_encoder"])
        model = GroveModel(cfg, dtype=self.model.dtype)
        return GroveForCausalLM(cfg, model, {"params": params})

    def calibrate(self, clip_frames, sam_frames,
                  margin: float = 1.0) -> "GroveForCausalLM":
        """Post-training calibration of static activation scales for the
        W8A8 vision towers. Call on a `quantize(vision=True)` instance
        with one (or more, concatenated on batch) representative clip:
        records per-site absmax during a forward of both encoders,
        installs per-tensor scales, and returns a NEW instance with
        `quant_static_act=True` — the serving path then quantizes
        activations in one fused elementwise op per site instead of a
        dynamic full-tensor absmax reduce (see ops/quant.py)."""
        import dataclasses

        from ..models.grove import GroveModel
        from ..ops.quant import collect_act_stats, install_act_scales

        assert self.cfg.clip.quant_w8a8 and self.cfg.sam_enc.quant_w8a8, \
            "calibrate() requires a quantize(vision=True) instance"
        params = self.variables["params"]
        stats_clip = collect_act_stats(
            self.model, params, clip_frames,
            method=type(self.model).encode_video)
        stats_sam = collect_act_stats(
            self.model, params, sam_frames,
            method=type(self.model).encode_grounding)
        params = dict(params)
        params["vision_tower"] = install_act_scales(
            params["vision_tower"], stats_clip["vision_tower"], margin)
        params["grounding_encoder"] = install_act_scales(
            params["grounding_encoder"], stats_sam["grounding_encoder"],
            margin)
        cfg = dataclasses.replace(
            self.cfg,
            clip=dataclasses.replace(self.cfg.clip,
                                     quant_static_act=True),
            sam_enc=dataclasses.replace(self.cfg.sam_enc,
                                        quant_static_act=True))
        model = GroveModel(cfg, dtype=self.model.dtype)
        return GroveForCausalLM(cfg, model, {"params": params})

    def fuse(self) -> "GroveForCausalLM":
        """Fused qkv/gate_up decode variant (models/fuse.py): bit-identical
        numerics, fewer wider matmuls per LLM layer. Composes with
        `quantize()` in either order. Returns a NEW instance."""
        import dataclasses

        from ..models.fuse import fuse_llama_projections
        from ..models.grove import GroveModel

        cfg = dataclasses.replace(
            self.cfg, llama=dataclasses.replace(self.cfg.llama,
                                                fused_qkv=True))
        params = fuse_llama_projections(self.variables["params"])
        model = GroveModel(cfg, dtype=self.model.dtype)
        return GroveForCausalLM(cfg, model, {"params": params})

    def save_pretrained(self, save_dir: str) -> None:
        """Write an HF-flax-layout model directory: `config.json` +
        `flax_model.msgpack` — round-trips through `from_pretrained`
        (grove_transformers publishes the same two-artifact layout to the
        hub, `modeling_grove.py:132-155` / `configuration_grove.py`)."""
        from flax import serialization
        os.makedirs(save_dir, exist_ok=True)
        self.cfg.save_json(os.path.join(save_dir, "config.json"))
        with open(os.path.join(save_dir, "flax_model.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(self.variables["params"]))

    # ------------------------------------------------------------------
    # mode-multiplexed surface (reference `model/GROVE.py:138-154`)
    # ------------------------------------------------------------------
    def encode_images(self, frames_clip):
        from ..infer.jit_utils import apply_jit
        return apply_jit(self.model, self.variables, frames_clip,
                         method="encode_video")

    def get_grounding_encoder_embs(self, frames_sam):
        from ..infer.jit_utils import encode_grounding_auto
        return encode_grounding_auto(self.model, self.variables,
                                     frames_sam)

    def get_dense_pe(self):
        return self.model.apply(self.variables,
                                method=GroveModel.dense_pe)

    def forward_train(self, batch: Dict):
        from ..infer.jit_utils import apply_jit
        return apply_jit(self.model, self.variables, batch,
                         method="forward_train")

    def forward_boxes(self, batch: Dict):
        from ..infer.jit_utils import apply_jit
        return apply_jit(self.model, self.variables, batch,
                         method="forward_boxes")

    def evaluate(self, tokenizer, spliced_ids, video_start, frames_clip,
                 frames_sam, max_new_tokens: int = 64):
        from ..infer.generate import generate_grounded
        return generate_grounded(self.model, self.variables, self.cfg,
                                 tokenizer, spliced_ids, video_start,
                                 frames_clip, frames_sam,
                                 max_new_tokens=max_new_tokens)

    def generate_clip(self, tokenizer, video_path: str, **kw):
        from .processor import GroveProcessor
        proc = GroveProcessor(tokenizer, self.cfg)
        return proc.generate(self.model, self.variables, video_path, **kw)
