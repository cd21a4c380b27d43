"""GROVE top-level model: grounded video caption generation, TPU-native.

Assembles the four sub-networks (CLIP tower + projector, SAM encoder,
LLaMA decoder, SAM-derived box decoder) with the mode-multiplexed surface of
the reference `GROVEForCausalLM` (`model/GROVE.py:101-451`) re-expressed as
explicit flax methods:

  encode_video        == mode "encode_images" (`model/GROVE.py:141-142`)
  encode_grounding    == mode "get_grounding_encoder_embs" (`:143-144`)
  dense_pe            == mode "get_dense_pe" (`:145-146`)
  forward_train       == model_forward(inference=False) (`:156-198`)
  forward_boxes       == model_forward(inference=True) teacher-forced boxes
  prefill/decode_step == the generate loop innards of evaluate() (`:412-451`)
  ground              == _process_hidden_states + prompt_encoder +
                         mask_decoder (`:248-331`)

Static-shape contract (vs the reference's ragged lists):
  frames_clip  (B, T, Hc, Wc, 3)    CLIP-preprocessed frames
  frames_sam   (B, T, Hs, Ws, 3)    SAM-preprocessed frames
  input_ids    (B, Ls)              spliced ids (video run = filler)
  video_start  (B,)                 index of the video token run
  det_positions(B, P)               hidden-state gather index per phrase
  phrase_mask  (B, P)
  boxes out    (B, T, P, 4) cxcywh in [0,1]; objectness logits (B, T, P)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GroveConfig
from ..ops import losses as loss_ops
from .clip import ClipVisionTower
from .llama import (LlamaEmbed, LlamaLMHead, LlamaModel, init_kv_caches)
from .sam_decoder import GroveBoxDecoder, PromptEncoder
from .sam_encoder import SamImageEncoder


class GroveModel(nn.Module):
    cfg: GroveConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    # optional NamedSharding for the LLM residual stream (sequence
    # parallelism; see models/llama.LlamaModel.act_sharding). Parameter-free,
    # so checkpoints are interchangeable with the unconstrained model.
    llm_act_sharding: object = None
    # optional NamedSharding (e.g. NamedSharding(mesh, P("data"))) pinning
    # the ground path's (B*T*P, ...) activations to the batch axis. Without
    # it GSPMD invents conflicting shardings inside the box decoder's tiny
    # attention ops under TP and falls back to involuntary full
    # rematerialization (replicate-then-reshard) every train step.
    ground_act_sharding: object = None

    def setup(self):
        cfg = self.cfg
        self.clip_tower = ClipVisionTower(
            cfg.clip, dtype=self.dtype, remat=self.remat,
            pool_thw=(cfg.pool_t, cfg.pool_h, cfg.pool_w), name="vision_tower")
        self.mm_projector_0 = nn.Dense(cfg.llama.hidden_size,
                                       dtype=self.dtype, name="mm_projector_0")
        self.mm_projector_2 = nn.Dense(cfg.llama.hidden_size,
                                       dtype=self.dtype, name="mm_projector_2")
        self.grounding_encoder = SamImageEncoder(cfg.sam_enc, dtype=self.dtype,
                                                 remat=self.remat,
                                                 name="grounding_encoder")
        self.prompt_encoder = PromptEncoder(cfg.sam_dec, dtype=self.dtype,
                                            name="prompt_encoder")
        self.box_decoder = GroveBoxDecoder(cfg.sam_dec, dtype=self.dtype,
                                           name="mask_decoder")
        self.text_fc_0 = nn.Dense(cfg.llama.hidden_size, dtype=self.dtype,
                                  name="text_hidden_fcs_0")
        self.text_fc_2 = nn.Dense(cfg.out_dim, dtype=self.dtype,
                                  name="text_hidden_fcs_2")
        if cfg.with_region:
            from .region import MLVLROIQueryModule
            self.region_encoder = MLVLROIQueryModule(
                embed_dims=cfg.clip.hidden_size,
                out_dims=cfg.llama.hidden_size, dtype=self.dtype,
                name="region_encoder")
        self.embed_tokens = LlamaEmbed(cfg.llama, dtype=self.dtype,
                                       name="embed_tokens")
        self.llama = LlamaModel(cfg.llama, dtype=self.dtype, remat=self.remat,
                                act_sharding=self.llm_act_sharding,
                                name="llama")
        self.lm_head = LlamaLMHead(cfg.llama, dtype=self.dtype,
                                   name="lm_head")

    # ------------------------------------------------------------------
    # encoders
    # ------------------------------------------------------------------

    def _yuv420_to_rgb(self, packed):
        """Packed (B, T, 3H/2, W) uint8 YUV420P -> (B, T, H, W, 3) f32
        RGB in [0, 255]. BT.601 limited range (swscale's SD default);
        nearest-neighbor chroma upsample. The decoder ships the native
        4:2:0 planes (1.5 B/px vs RGB24's 3) because host->device bytes
        bound e2e inference (`native/video_decoder.cc:vd_decode_at_yuv`,
        benchmarks/h2d_probe.py)."""
        from ..data.preprocess import YUV_OFFSET, YUV_TO_RGB
        b, t, h32, w = packed.shape
        h = h32 * 2 // 3
        y = packed[:, :, :h].astype(jnp.float32)
        u = packed[:, :, h:, :w // 2].astype(jnp.float32)
        v = packed[:, :, h:, w // 2:].astype(jnp.float32)
        u = jnp.repeat(jnp.repeat(u, 2, axis=2), 2, axis=3)
        v = jnp.repeat(jnp.repeat(v, 2, axis=2), 2, axis=3)
        yuv = jnp.stack([y, u, v], axis=-1) - jnp.asarray(YUV_OFFSET)
        rgb = yuv @ jnp.asarray(YUV_TO_RGB).T
        return jnp.clip(jnp.round(rgb), 0.0, 255.0)

    def _norm_clip(self, frames):
        """Device-side CLIP normalization for uint8 inputs (host->device
        bandwidth is the pipeline bottleneck; uint8 is 4x smaller).

        RAW frames (spatial dims != the CLIP grid) additionally run the
        shortest-edge resize + center crop ON DEVICE (the reference does
        this on host via HF CLIPImageProcessor, `HowTo100M.py:309-313`;
        `data/preprocess.clip_preprocess` is the host mirror) — shipping
        one raw uint8 copy per clip is the only layout that survives the
        ~27 MB/s relay H2D (benchmarks/h2d_probe.py). A 4-D uint8 input
        is packed YUV420P (see `_yuv420_to_rgb`), halving bytes again."""
        if frames.dtype != jnp.uint8:
            return frames
        from ..data.preprocess import CLIP_MEAN, CLIP_STD
        size = self.cfg.clip.image_size
        if frames.ndim == 4:
            frames = self._yuv420_to_rgb(frames).astype(jnp.uint8)
        b, t, h, w, _ = frames.shape
        if (h, w) != (size, size):
            scale = size / min(h, w)
            nh, nw = round(h * scale), round(w * scale)
            xf = jax.image.resize(frames.astype(jnp.float32),
                                  (b, t, nh, nw, 3), method="bicubic")
            top, left = (nh - size) // 2, (nw - size) // 2
            xf = xf[:, :, top:top + size, left:left + size, :]
            # PIL materializes uint8 between resize and rescale: round +
            # clamp (bicubic overshoots) to mirror that quantization
            xf = jnp.round(jnp.clip(xf, 0.0, 255.0))
            frames = xf.astype(self.dtype)
        xf = frames.astype(self.dtype) / 255.0
        return ((xf - jnp.asarray(CLIP_MEAN, self.dtype))
                / jnp.asarray(CLIP_STD, self.dtype))

    def _norm_sam(self, frames, valid_hw=None):
        """Device-side SAM normalization; pad region re-zeroed to match the
        reference's normalize-then-pad order (`HowTo100M.py:168-178`).

        RAW frames also run ResizeLongestSide + bottom/right zero-pad on
        device (`data/preprocess.sam_preprocess` is the host mirror); the
        valid region is static (derived from the input shape), so
        `valid_hw` is not needed in that mode. A 4-D uint8 input is
        packed YUV420P (see `_yuv420_to_rgb`)."""
        if frames.dtype != jnp.uint8:
            return frames
        from ..data.preprocess import SAM_MEAN, SAM_STD
        size = self.cfg.sam_enc.img_size
        if frames.ndim == 4:
            frames = self._yuv420_to_rgb(frames).astype(jnp.uint8)
        b, t, h, w, _ = frames.shape
        if (h, w) != (size, size):
            scale = size / max(h, w)
            nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
            xf = jax.image.resize(frames.astype(jnp.float32),
                                  (b, t, nh, nw, 3), method="bilinear")
            xf = jnp.round(jnp.clip(xf, 0.0, 255.0))
            xf = ((xf - jnp.asarray(SAM_MEAN, jnp.float32))
                  / jnp.asarray(SAM_STD, jnp.float32)).astype(self.dtype)
            return jnp.pad(xf, ((0, 0), (0, 0), (0, size - nh),
                                (0, size - nw), (0, 0)))
        xf = ((frames.astype(self.dtype) - jnp.asarray(SAM_MEAN, self.dtype))
              / jnp.asarray(SAM_STD, self.dtype))
        if valid_hw is not None:
            b, t, hh, ww, _ = xf.shape
            rows = jnp.arange(hh)[None, None, :, None]
            cols = jnp.arange(ww)[None, None, None, :]
            mask = ((rows < valid_hw[:, 0][:, None, None, None])
                    & (cols < valid_hw[:, 1][:, None, None, None]))
            xf = jnp.where(mask[..., None], xf, 0.0)
        return xf

    def encode_video(self, frames_clip):
        """CLIP tower + mm_projector -> (B, N_video, hidden).

        By default the tower is non-differentiable like the reference
        (@torch.no_grad on `clip_encoder.py:55`); gradients flow only into
        the projector. `cfg.train_clip_adapters=True` lifts the
        stop_gradient so the tower's video adapters (marked trainable by
        the freeze policy) actually receive gradient.
        """
        tokens, mlvl = self.clip_tower(self._norm_clip(frames_clip))
        if not self.cfg.train_clip_adapters:
            tokens = jax.lax.stop_gradient(tokens)
        x = self.mm_projector_0(tokens)
        x = nn.gelu(x, approximate=False)
        x = self.mm_projector_2(x)
        return x, mlvl

    def encode_grounding(self, frames_sam, valid_hw=None):
        """SAM encoder -> (B*T, HW, C_dec) flattened frame embeddings."""
        feat = self.grounding_encoder(
            self._norm_sam(frames_sam, valid_hw))      # (B*T, g, g, C)
        bt, g, _, c = feat.shape
        return feat.reshape(bt, g * g, c)

    def dense_pe(self):
        return self.prompt_encoder.get_dense_pe()      # (g, g, C)

    def encode_regions(self, mlvl_feats, rois_norm, roi_batch_idx):
        """<bbox>-prompt region queries (`llava_with_region_arch.py:114-125`).

        mlvl_feats: CLIP multi-level patch features from encode_video;
        rois_norm: (N, 4) normalized xyxy; roi_batch_idx: (N,).
        Returns (N, hidden) region query embeddings."""
        return self.region_encoder(mlvl_feats, rois_norm, roi_batch_idx)

    def splice_regions(self, embeds, input_ids, region_embeds):
        """Replace <bbox>-token embeddings with region queries.

        Mirrors `llava_with_region_arch.py:333-347`: the k-th <bbox> token of
        sample b takes region_embeds row for that (b, k). region_embeds:
        (B, R, D) zero-padded; positions are located by token id."""
        bbox_id = self.cfg.tokens.bbox
        b, l = input_ids.shape
        is_bbox = input_ids == bbox_id                     # (B, L)
        # k-th occurrence index for every position
        occ = jnp.cumsum(is_bbox, axis=1) - 1              # (B, L)
        occ = jnp.clip(occ, 0, region_embeds.shape[1] - 1)
        gathered = jnp.take_along_axis(
            region_embeds, occ[..., None].astype(jnp.int32), axis=1)
        return jnp.where(is_bbox[..., None], gathered.astype(embeds.dtype),
                         embeds)

    # ------------------------------------------------------------------
    # language model
    # ------------------------------------------------------------------

    def _splice(self, input_ids, video_embeds, video_start):
        """Insert video features into the token embedding stream."""
        embeds = self.embed_tokens(input_ids)          # (B, Ls, D)

        def one(row, feats, start):
            safe = jnp.maximum(start, 0)
            spliced = jax.lax.dynamic_update_slice(
                row, feats.astype(row.dtype), (safe, 0))
            return jnp.where(start >= 0, spliced, row)

        return jax.vmap(one)(embeds, video_embeds, video_start)

    def lm_forward(self, input_ids, video_embeds, video_start,
                   attn_mask=None):
        """Full-sequence LM pass -> (hidden post-norm, logits)."""
        x = self._splice(input_ids, video_embeds, video_start)
        positions = jnp.arange(input_ids.shape[1])[None, :]
        positions = jnp.broadcast_to(positions, input_ids.shape)
        hidden, _ = self.llama(x, positions)
        logits = self.lm_head(hidden)
        return hidden, logits

    def prefill(self, input_ids, video_embeds, video_start, kv_caches,
                pad_lens=None):
        """Prompt pass writing the KV cache.

        Equal-length prompts need no padding (the reference's fixed
        inference instruction). Unequal prompts are LEFT-padded by the
        caller, which passes `pad_lens` (B,); padded slots are masked from
        attention and RoPE positions start at each sample's true start."""
        x = self._splice(input_ids, video_embeds, video_start)
        positions = jnp.broadcast_to(
            jnp.arange(input_ids.shape[1])[None, :], input_ids.shape)
        if pad_lens is not None:
            positions = jnp.maximum(positions - pad_lens[:, None], 0)
        hidden, caches = self.llama(x, positions, kv_caches=kv_caches,
                                    cache_offset=0, pad_lens=pad_lens)
        logits = self.lm_head(hidden[:, -1:])
        return hidden, logits, caches

    def decode_step(self, token, pos, kv_caches, pad_lens=None):
        """One greedy step. token: (B, 1) ids; pos: scalar position."""
        x = self.embed_tokens(token)
        positions = jnp.full(token.shape, pos, dtype=jnp.int32)
        if pad_lens is not None:
            positions = positions - pad_lens[:, None]
        hidden, caches = self.llama(x, positions, kv_caches=kv_caches,
                                    cache_offset=pos, pad_lens=pad_lens)
        logits = self.lm_head(hidden)
        return hidden, logits, caches

    # ------------------------------------------------------------------
    # grounding head
    # ------------------------------------------------------------------

    def ground(self, hidden, det_positions, image_embeddings):
        """Hidden states + det positions -> per-frame boxes/objectness.

        hidden: (B, L, D); det_positions: (B, P); image_embeddings
        (B*T, HW, C). Output (B, T, P, 4) sigmoid-cxcywh and (B, T, P)
        objectness logits. Mirrors `_process_hidden_states` +
        `_generate_and_postprocess_masks` with the per-phrase gather done
        BEFORE the projection MLP (pointwise => identical numerics, P<<L
        cheaper).
        """
        cfg = self.cfg
        b, seq_len, _ = hidden.shape
        p = det_positions.shape[1]
        t = image_embeddings.shape[0] // b

        # one-hot matmul instead of take_along_axis: an elementwise gather
        # lowers to a scalar loop on TPU (measured 27 ms of the ground call
        # at batch 32); the (B, P, L) @ (B, L, D) einsum rides the MXU and
        # is exact (0/1 selectors, fp32 accumulation)
        onehot = jax.nn.one_hot(det_positions.astype(jnp.int32), seq_len,
                                dtype=hidden.dtype)
        gathered = jnp.einsum("bpl,bld->bpd", onehot, hidden)
        x = self.text_fc_0(gathered)
        x = nn.relu(x)
        pred_embeds = self.text_fc_2(x)                # (B, P, out_dim)

        sparse, dense = self.prompt_encoder(
            text_embeds=pred_embeds.reshape(b * p, 1, cfg.out_dim))
        # (B, P, 1, C) -> tile over frames -> (B*T*P, 1, C)
        sparse = sparse.reshape(b, 1, p, 1, -1)
        sparse = jnp.broadcast_to(sparse, (b, t, p, 1, sparse.shape[-1]))
        sparse = sparse.reshape(b * t * p, 1, -1)

        # regular (frame x phrase) layout: expand by broadcast instead of a
        # row gather (instance_to_image=None -> identity in the decoder)
        hw, c = image_embeddings.shape[1:]
        src = jnp.broadcast_to(image_embeddings[:, None],
                               (b * t, p, hw, c)).reshape(b * t * p, hw, c)
        if self.ground_act_sharding is not None:
            # anchor GSPMD propagation through the two-way transformer on
            # the batch axis (see attribute comment)
            src = jax.lax.with_sharding_constraint(
                src, self.ground_act_sharding)
            sparse = jax.lax.with_sharding_constraint(
                sparse, self.ground_act_sharding)
        image_pe = self.dense_pe()
        boxes, obj = self.box_decoder(src, image_pe, sparse, dense, None)
        boxes = boxes.reshape(b, t, p, 4)
        if obj is not None:
            obj = obj.reshape(b, t, p)
        return boxes, obj

    # ------------------------------------------------------------------
    # end-to-end paths
    # ------------------------------------------------------------------

    def forward_train(self, batch: Dict[str, jax.Array]):
        """Training forward -> loss dict (reference model_forward train path)."""
        cfg = self.cfg
        video_embeds, _ = self.encode_video(batch["frames_clip"])
        image_embeddings = self.encode_grounding(
            batch["frames_sam"], batch.get("sam_valid_hw"))
        hidden, logits = self.lm_forward(
            batch["input_ids"], video_embeds, batch["video_start"])
        boxes, obj = self.ground(hidden, batch["det_positions"],
                                 image_embeddings)
        return loss_ops.grove_total_loss(
            logits, batch["labels"], boxes, obj,
            batch["gt_boxes"], batch["gt_objectness"], batch["phrase_mask"],
            ce_weight=cfg.ce_loss_weight, giou_weight=cfg.giou_loss_weight,
            objectness_weight=cfg.temp_objectness_loss_weight,
            use_temp_objectness=cfg.use_temp_objectness,
            ignore_index=cfg.tokens.ignore_index)

    def segment(self, image_embeddings, *, points=None, point_labels=None,
                boxes=None, mask_inputs=None, multimask_output=False):
        """SAM-style promptable segmentation (the reference's legacy mask
        path, `mask_decoder.py:206-227` + `sam.py:56-137`).

        image_embeddings: (N, HW, C) from encode_grounding; prompts are
        per-instance. Returns (masks (N, M, 4g, 4g) logits, iou_pred (N, M)).
        """
        n = image_embeddings.shape[0]
        sparse, dense = self.prompt_encoder(
            points=points, point_labels=point_labels, boxes=boxes,
            masks=mask_inputs)
        inst2img = jnp.arange(n)
        image_pe = self.dense_pe()
        return self.box_decoder.predict_masks(
            image_embeddings, image_pe, sparse, dense, inst2img,
            multimask_output=multimask_output)

    def init_all(self, batch: Dict[str, jax.Array]):
        """Init-only path touching every submodule (incl. the dormant region
        encoder and legacy SAM mask path, which ship in reference
        checkpoints)."""
        out = self.forward_train(batch)
        if self.cfg.with_region:
            _, mlvl = self.encode_video(batch["frames_clip"])
            rois = jnp.array([[0.1, 0.1, 0.6, 0.6]], jnp.float32)
            bidx = jnp.zeros((1,), jnp.int32)
            _ = self.encode_regions(mlvl, rois, bidx)
        # legacy SAM surface: point/box/mask prompts + mask outputs
        g = self.cfg.sam_dec.image_embedding_size
        c = self.cfg.sam_dec.embed_dim
        dummy_emb = jnp.zeros((1, g * g, c), self.dtype)
        pts = jnp.array([[[8.0, 8.0]]], jnp.float32)
        lbl = jnp.array([[1]], jnp.int32)
        bxs = jnp.array([[1.0, 1.0, 12.0, 12.0]], jnp.float32)
        msk = jnp.zeros((1, 4 * g, 4 * g, 1), jnp.float32)
        _ = self.segment(dummy_emb, points=pts, point_labels=lbl, boxes=bxs,
                         mask_inputs=msk)
        return out

    def forward_boxes(self, batch: Dict[str, jax.Array]):
        """Teacher-forced inference path -> raw boxes + objectness logits
        (reference model_forward(inference=True)); unnormalization and
        objectness thresholding are host-side postprocessing."""
        video_embeds, _ = self.encode_video(batch["frames_clip"])
        image_embeddings = self.encode_grounding(
            batch["frames_sam"], batch.get("sam_valid_hw"))
        hidden, _ = self.lm_forward(
            batch["input_ids"], video_embeds, batch["video_start"])
        boxes, obj = self.ground(hidden, batch["det_positions"],
                                 image_embeddings)
        return {"pred_boxes": boxes, "objectness_logits": obj}


def init_grove_params(cfg: GroveConfig, rng, dtype=jnp.bfloat16,
                      batch: int = 1, remat: bool = False):
    """Initialize a full parameter tree with dummy inputs."""
    model = GroveModel(cfg, dtype=dtype, remat=remat)
    t = cfg.num_frames
    dummy = {
        "frames_clip": jnp.zeros((batch, t, cfg.clip.image_size,
                                  cfg.clip.image_size, 3), dtype),
        "frames_sam": jnp.zeros((batch, t, cfg.sam_enc.img_size,
                                 cfg.sam_enc.img_size, 3), dtype),
        "input_ids": jnp.zeros((batch, cfg.num_video_tokens + 8), jnp.int32),
        "video_start": jnp.zeros((batch,), jnp.int32),
        "labels": jnp.full((batch, cfg.num_video_tokens + 8), -100,
                           jnp.int32),
        "det_positions": jnp.zeros((batch, cfg.max_phrases), jnp.int32),
        "phrase_mask": jnp.zeros((batch, cfg.max_phrases), jnp.float32),
        "gt_boxes": jnp.zeros((batch, t, cfg.max_phrases, 4), jnp.float32),
        "gt_objectness": jnp.zeros((batch, t, cfg.max_phrases), jnp.float32),
    }
    # jit the init: on the axon TPU relay eager execution is pathologically
    # slow, and jit also avoids materializing intermediate activations.
    init_fn = jax.jit(
        lambda r: model.init(r, dummy, method=GroveModel.init_all))
    variables = init_fn(rng)
    return model, variables
