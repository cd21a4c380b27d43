"""SAM prompt encoder + two-way transformer + GROVE box/objectness heads.

Re-design of `model/SAM/modeling/{prompt_encoder,transformer,mask_decoder}.py`
with the ragged `reps`/`index_select` batching of the reference
(`mask_decoder.py:176-184`) replaced by a static (B*T*P) layout: every
(frame, phrase) pair is an independent decoder instance whose token sequence
is [iou_token, 4 mask_tokens, text_embed] — exactly the reference's 6-token
sequence with one text prompt (`mask_decoder.py:164-199`). Invalid phrases
(beyond the per-sample phrase count) are masked downstream.

The legacy mask path (upscaling + hypernetwork MLPs + IoU head) is kept both
for checkpoint parity and to expose SAM-style mask output as a framework
capability.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import SamDecoderConfig
from .layers import LayerNorm2d, MLP


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (`prompt_encoder.py:189-238`)."""
    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, coords):  # (..., 2) in [0, 1]
        gauss = self.param("positional_encoding_gaussian_matrix",
                           nn.initializers.normal(1.0),
                           (2, self.num_pos_feats), jnp.float32)
        c = 2.0 * coords.astype(jnp.float32) - 1.0
        c = c @ gauss
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid_pe(self, size: Tuple[int, int]):
        """Dense PE for an (h, w) grid -> (h, w, 2*num_pos_feats)."""
        h, w = size
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)
        return self(grid)


class PromptEncoder(nn.Module):
    """Sparse (points/boxes/text) + dense (mask) prompt embeddings."""
    cfg: SamDecoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.pe_layer = PositionEmbeddingRandom(cfg.embed_dim // 2,
                                                name="pe_layer")
        self.point_embeddings = [
            self.param(f"point_embeddings_{i}", nn.initializers.normal(1.0),
                       (1, cfg.embed_dim), jnp.float32)
            for i in range(4)]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (1, cfg.embed_dim), jnp.float32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0),
            (1, cfg.embed_dim), jnp.float32)
        # mask-input downscaling stack (`prompt_encoder.py:56-64`)
        mc = cfg.mask_in_chans
        self.mask_down_conv1 = nn.Conv(mc // 4, (2, 2), strides=(2, 2),
                                       dtype=self.dtype, name="mask_down_0")
        self.mask_down_ln1 = LayerNorm2d(name="mask_down_1")
        self.mask_down_conv2 = nn.Conv(mc, (2, 2), strides=(2, 2),
                                       dtype=self.dtype, name="mask_down_3")
        self.mask_down_ln2 = LayerNorm2d(name="mask_down_4")
        self.mask_down_conv3 = nn.Conv(cfg.embed_dim, (1, 1),
                                       dtype=self.dtype, name="mask_down_6")

    def get_dense_pe(self):
        g = self.cfg.image_embedding_size
        return self.pe_layer.grid_pe((g, g))          # (g, g, C)

    def embed_points(self, points, labels, pad: bool = True):
        """points: (B, N, 2) pixel coords; labels: (B, N) in {-1, 0, 1}."""
        cfg = self.cfg
        points = points + 0.5
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros_like(points[:, :1])], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones_like(labels[:, :1])], axis=1)
        coords = points / cfg.input_image_size
        pe = self.pe_layer(coords)
        pe = jnp.where((labels == -1)[..., None],
                       self.not_a_point_embed[0], pe)
        pe = pe + jnp.where((labels == 0)[..., None],
                            self.point_embeddings[0][0], 0.0)
        pe = pe + jnp.where((labels == 1)[..., None],
                            self.point_embeddings[1][0], 0.0)
        return pe

    def embed_boxes(self, boxes):
        """boxes: (B, 4) xyxy pixels -> (B, 2, C) corner embeddings."""
        cfg = self.cfg
        coords = (boxes + 0.5).reshape(-1, 2, 2) / cfg.input_image_size
        pe = self.pe_layer(coords)
        pe = pe.at[:, 0].add(self.point_embeddings[2][0])
        pe = pe.at[:, 1].add(self.point_embeddings[3][0])
        return pe

    def embed_masks(self, masks):
        """(B, 4g, 4g, 1) mask inputs -> (B, g, g, C) dense embeddings."""
        x = self.mask_down_conv1(masks.astype(self.dtype))
        x = nn.gelu(self.mask_down_ln1(x), approximate=False)
        x = self.mask_down_conv2(x)
        x = nn.gelu(self.mask_down_ln2(x), approximate=False)
        return self.mask_down_conv3(x)

    def __call__(self, text_embeds=None, points=None, point_labels=None,
                 boxes=None, masks=None):
        """Returns (sparse (B, N, C), dense embeddings).

        The GROVE path passes only `text_embeds` (B, 1, C)
        (`model/GROVE.py:275-277`): sparse = text embeds, dense = the
        no-mask embedding broadcast over the grid. SAM-style prompting may
        add points/boxes/mask inputs (`prompt_encoder.py:140-186`).
        """
        cfg = self.cfg
        parts = []
        if points is not None:
            parts.append(self.embed_points(points, point_labels,
                                           pad=boxes is None))
        if boxes is not None:
            parts.append(self.embed_boxes(boxes))
        if text_embeds is not None:
            parts.append(text_embeds.astype(jnp.float32))
        sparse = jnp.concatenate(parts, axis=1)
        g = cfg.image_embedding_size
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = jnp.broadcast_to(self.no_mask_embed[0],
                                     (g, g, cfg.embed_dim))
        return sparse.astype(self.dtype), dense.astype(self.dtype)


class DownsampleAttention(nn.Module):
    """Attention with projection to internal_dim = C / downsample_rate
    (`transformer.py:185-242`)."""
    embed_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embed_dim // self.downsample_rate
        nh = self.num_heads
        hd = internal // nh
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)
        b, nq, _ = qp.shape
        nk = kp.shape[1]
        qh = qp.reshape(b, nq, nh, hd)
        kh = kp.reshape(b, nk, nh, hd)
        vh = vp.reshape(b, nk, nh, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        out = out.reshape(b, nq, internal)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    cfg: SamDecoderConfig
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        if self.skip_first_layer_pe:
            # reference replaces queries by the attention output here
            # (`transformer.py:155-156`), no residual
            queries = DownsampleAttention(
                cfg.embed_dim, cfg.num_heads, 1, dtype=self.dtype,
                name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampleAttention(
                cfg.embed_dim, cfg.num_heads, 1, dtype=self.dtype,
                name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampleAttention(
            cfg.embed_dim, cfg.num_heads, cfg.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm2")(queries)

        h = nn.Dense(cfg.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        h = nn.relu(h)
        h = nn.Dense(cfg.embed_dim, dtype=self.dtype, name="mlp_lin2")(h)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampleAttention(
            cfg.embed_dim, cfg.num_heads, cfg.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    cfg: SamDecoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, HW, C); point_embedding: (B, N, C)."""
        queries = point_embedding
        keys = image_embedding
        for i in range(self.cfg.depth):
            queries, keys = TwoWayAttentionBlock(
                self.cfg, skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        attn_out = DownsampleAttention(
            self.cfg.embed_dim, self.cfg.num_heads,
            self.cfg.attention_downsample_rate, dtype=self.dtype,
            name="final_attn_token_to_image")(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys


class GroveBoxDecoder(nn.Module):
    """SAM mask decoder with GROVE's query box/objectness heads.

    __call__ (decoding_type="query", the GROVE path): per (frame x phrase)
    instance, token seq [iou, 4 mask, text] -> sigmoid cxcywh box +
    objectness logit (`mask_decoder.py:191-203`).

    predict_masks (legacy SAM path, retained in the reference and its
    checkpoints `mask_decoder.py:206-227`): upscale the attended image
    embedding and dot with hypernetwork MLPs -> (N, num_mask_tokens, 4g, 4g)
    masks + IoU predictions, enabling SAM-style promptable segmentation.
    """
    cfg: SamDecoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                                    (1, cfg.embed_dim), jnp.float32)
        self.mask_tokens = self.param("mask_tokens",
                                      nn.initializers.normal(1.0),
                                      (cfg.num_mask_tokens, cfg.embed_dim),
                                      jnp.float32)
        self.transformer = TwoWayTransformer(cfg, dtype=self.dtype,
                                             name="transformer")
        self.bbox_head_0 = nn.Dense(cfg.embed_dim, dtype=self.dtype,
                                    name="bbox_head_0")
        self.bbox_head_2 = nn.Dense(4, dtype=self.dtype, name="bbox_head_2")
        if cfg.use_temp_objectness:
            self.temporal_objectness_head = nn.Dense(
                1, dtype=self.dtype, name="temporal_objectness_head")
        # legacy mask path (`mask_decoder.py:57-77`)
        self.upscale_conv1 = nn.ConvTranspose(
            cfg.embed_dim // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="output_upscaling_0")
        self.upscale_ln = LayerNorm2d(name="output_upscaling_1")
        self.upscale_conv2 = nn.ConvTranspose(
            cfg.embed_dim // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="output_upscaling_3")
        self.hyper_mlps = [
            MLP(cfg.embed_dim, cfg.embed_dim // 8, 3, dtype=self.dtype,
                name=f"output_hypernetworks_mlps_{i}")
            for i in range(cfg.num_mask_tokens)]
        self.iou_prediction_head = MLP(
            cfg.iou_head_hidden_dim, cfg.num_mask_tokens,
            cfg.iou_head_depth, dtype=self.dtype,
            name="iou_prediction_head")

    def _run_transformer(self, image_embeddings, image_pe, sparse_embeddings,
                         dense_embeddings, instance_to_image):
        cfg = self.cfg
        n_inst = sparse_embeddings.shape[0]
        output_tokens = jnp.concatenate([self.iou_token, self.mask_tokens],
                                        axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens.astype(self.dtype)[None],
            (n_inst, 1 + cfg.num_mask_tokens, cfg.embed_dim))
        tokens = jnp.concatenate(
            [output_tokens, sparse_embeddings.astype(self.dtype)], axis=1)

        # instance_to_image=None: embeddings are already per-instance
        src = (image_embeddings if instance_to_image is None
               else image_embeddings[instance_to_image])   # (N_inst, HW, C)
        dense = dense_embeddings.reshape(-1, src.shape[1], cfg.embed_dim)
        src = src + dense
        pos = jnp.broadcast_to(image_pe.reshape(1, -1, cfg.embed_dim),
                               src.shape).astype(self.dtype)
        hs, keys = self.transformer(src, pos, tokens)
        return hs, keys

    def __call__(self, image_embeddings, image_pe, sparse_embeddings,
                 dense_embeddings, instance_to_image):
        cfg = self.cfg
        hs, _ = self._run_transformer(image_embeddings, image_pe,
                                      sparse_embeddings, dense_embeddings,
                                      instance_to_image)
        query_out = hs[:, 1 + cfg.num_mask_tokens:, :]     # (N_inst, 1, C)
        h = nn.relu(self.bbox_head_0(query_out))
        boxes = jax.nn.sigmoid(self.bbox_head_2(h))[:, 0, :]
        obj_logits = None
        if cfg.use_temp_objectness:
            obj_logits = self.temporal_objectness_head(query_out)[:, 0, 0]
        return boxes, obj_logits

    def predict_masks(self, image_embeddings, image_pe, sparse_embeddings,
                      dense_embeddings, instance_to_image,
                      multimask_output: bool = False):
        """Legacy SAM mask outputs (`mask_decoder.py:206-227`)."""
        cfg = self.cfg
        g = cfg.image_embedding_size
        hs, keys = self._run_transformer(image_embeddings, image_pe,
                                         sparse_embeddings,
                                         dense_embeddings, instance_to_image)
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1:1 + cfg.num_mask_tokens, :]

        src = keys.reshape(-1, g, g, cfg.embed_dim)
        up = self.upscale_conv1(src)
        up = nn.gelu(self.upscale_ln(up), approximate=False)
        up = nn.gelu(self.upscale_conv2(up), approximate=False)
        n, uh, uw, uc = up.shape
        hyper_in = jnp.stack(
            [self.hyper_mlps[i](mask_tokens_out[:, i, :])
             for i in range(cfg.num_mask_tokens)], axis=1)  # (N, M, uc)
        masks = jnp.einsum("nmc,nhwc->nmhw", hyper_in, up)
        iou_pred = self.iou_prediction_head(iou_token_out)
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]
