"""Weight-only int8 quantization for serving.

Why: GROVE's LLaMA-7B weights are 13.5 GB in bf16 — with the vision
towers the full 8.4B model (16.8 GB) does NOT fit one v5e chip's
15.75 GB HBM, so bf16 serving needs 2-way tensor parallelism. Per-output-
channel absmax int8 halves the LLM weights to ~6.7 GB, and the whole
model (+KV cache +activations) serves on a SINGLE chip — no ICI hop, and
every chip in a fleet serves independently.

Scheme: y = (x @ W_int8) * scale, scale per output channel (absmax/127),
LLM Dense kernels only (q/k/v/o, gate/up/down, lm_head). Embeddings,
norms, LoRA deltas, vision towers and the grounding decoder stay bf16 —
they are a small fraction of the bytes and carry the quantization-
sensitive paths (adapters are zero-init-gated; the decoder regresses
boxes). Per-channel weight-only int8 on LLaMA-class models is the
standard serving recipe with sub-0.1-CIDEr-class impact; activations
remain bf16 (W8A16).

The torch converter stays f32 — quantization is a post-load transform
(`quantize_llama_tree`), so one checkpoint serves both precisions.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# llama Dense kernels + lm_head; excludes LoRA (kernel names lora_A/B
# don't match these suffixes' parents) and embed_tokens (gather, small)
_QUANT_PATTERNS = (
    r"llama/layers_\d+/self_attn/(q|k|v|o)_proj$",
    r"llama/layers_\d+/mlp/(gate|up|down)_proj$",
    r"lm_head/lm_head$",
)

# SAM ViTDet encoder Dense kernels (W8A8 serving mode: the encoder is
# compute-bound, so activations quantize dynamically too — see
# `Int8Dense.act_quant`). Patchify/neck/adapters/norms stay bf16/f32.
SAM_QUANT_PATTERNS = (
    r"blocks_\d+/attn/(qkv|proj)$",
    r"blocks_\d+/mlp/lin[12]$",
    # gated video adapters: 27 shifted C x C taps, int8 with a shared
    # per-output-channel scale (`_Conv3dShifts.quant_w8a8`). Does NOT
    # match CLIP's adapters_N/adapter/conv3d nesting.
    r"adapters_\d+/conv3d$",
)

# CLIP ViT encoder Dense kernels (W8A8). NOTE: these patterns also match
# LLaMA's layers_N/self_attn/q_proj paths — apply them to the TOWER
# subtree only (`quantize_clip_tree(params["vision_tower"])`), never to a
# full GroveModel tree.
CLIP_QUANT_PATTERNS = (
    r"layers_\d+/self_attn/(q|k|v|out)_proj$",
    r"layers_\d+/fc[12]$",
    # gated video adapters (~39% of tower FLOPs at CLIP-L/336 scale)
    r"adapters_\d+/adapter/conv3d$",
)


def quantize_kernel(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(..., in, out) f32/bf16 -> int8 kernel + per-output-channel f32
    scale (max over every non-output axis — conv taps share channel
    scales so the activation scale factors out of tap accumulation)."""
    k = np.asarray(kernel, np.float32)
    flat = k.reshape(-1, k.shape[-1])
    scale = np.max(np.abs(flat), axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_tree(params: Dict, patterns) -> Dict:
    """Return a copy of a param tree with Dense kernels whose path matches
    any of `patterns` replaced by {"kernel_q": int8, "scale": f32} — the
    structure `Int8Dense` expects. Sibling entries (bias, LoRA) pass
    through unchanged, as do non-matching params."""
    regexes = [re.compile(p) for p in patterns]

    def rec(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                if any(r.search(path) for r in regexes) and "kernel" in v:
                    q, s = quantize_kernel(np.asarray(v["kernel"]))
                    rest = {kk: vv for kk, vv in v.items()
                            if kk != "kernel"}
                    out[k] = {"kernel_q": jnp.asarray(q),
                              "scale": jnp.asarray(s), **rest}
                else:
                    out[k] = rec(v, path)
            else:
                out[k] = v
        return out

    return rec(params)


def quantize_llama_tree(params: Dict) -> Dict:
    """LLM serving quantization (W8A16 decode path): q/k/v/o, mlp and
    lm_head kernels -> int8 + per-output-channel scales."""
    return quantize_tree(params, _QUANT_PATTERNS)


def pack_int4(q: np.ndarray, group: int) -> np.ndarray:
    """int4 values (K, N) int8 in [-8, 7] -> PACKED (K/2, N) int8.

    Pairs whole quantization GROUPS along K: packed row ``p*G + i``
    (p = super-group, i < G) holds logical elements ``(2p)G + i`` in its
    low nibble and ``(2p+1)G + i`` in its high nibble. Group-pair packing
    keeps each nibble plane a contiguous K-slice of its own quant group,
    so the matmul kernel unpacks into two full (G, N) operands — two
    K=G MXU dots per step, no sublane interleave.

    Why packed int8 at all: the axon relay cannot move ``jnp.int4``
    arrays across jit boundaries (eager ops and jit-arg passing both
    recurse in device_put — measured in `benchmarks/int4_probe.py`), so
    int4 weights live as packed bytes and are unpacked in-kernel.
    """
    kin, out = q.shape
    assert kin % (2 * group) == 0, (kin, group)
    v = q.reshape(kin // (2 * group), 2, group, out)
    lo = v[:, 0].astype(np.uint8) & 0x0F
    hi = (v[:, 1].astype(np.uint8) & 0x0F) << 4
    return (lo | hi).astype(np.int8).reshape(kin // 2, out)


def unpack_int4(packed: jnp.ndarray, group: int) -> jnp.ndarray:
    """PACKED (K/2, N) int8 -> (K/G groups, G, N) int8 values (jit-safe).

    Inverse of `pack_int4`; shifts run in int32 (native VPU width)."""
    half, out = packed.shape
    s = half // group                       # super-groups
    p32 = packed.reshape(s, group, out).astype(jnp.int32)
    lo = jnp.left_shift(p32, 28) >> 28      # sign-extended low nibble
    hi = p32 >> 4                           # arithmetic: high nibble
    w = jnp.stack([lo, hi], axis=1)         # (s, 2, G, N)
    return w.reshape(2 * s, group, out).astype(jnp.int8)


def quantize_kernel_int4(kernel: np.ndarray,
                         group: int = 128) -> Tuple[np.ndarray, np.ndarray]:
    """(in, out) f32/bf16 -> PACKED int4 kernel + per-(group, out) scales.

    Group-wise round-to-nearest absmax over `group`-sized slices of the
    INPUT dim (GPTQ storage convention): q = round(k / s[g, n]) in
    [-7, 7], s = groupwise absmax / 7. Symmetric around zero so the
    Int4Dense dequant needs no zero-points. Returns
    ``(packed (K/2, N) int8, scale (K/G, N) f32)`` — see `pack_int4`.
    """
    k = np.asarray(kernel, np.float32)
    kin, out = k.shape
    while group > 1 and kin % (2 * group):
        group //= 2
    assert kin % (2 * group) == 0, (kin, group)
    g = k.reshape(kin // group, group, out)
    scale = np.max(np.abs(g), axis=1) / 7.0           # (G, out)
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(g / scale[:, None, :]), -7, 7)
    packed = pack_int4(q.reshape(kin, out).astype(np.int8), group)
    return packed, scale.astype(np.float32)


# int4 covers the bulk projection weights; lm_head is quality-sensitive
# (logits feed greedy/beam argmax directly) and a single matrix, so it
# stays per-channel int8
_QUANT4_PATTERNS = (
    r"llama/layers_\d+/self_attn/(q|k|v|o)_proj$",
    r"llama/layers_\d+/self_attn/qkv_proj$",
    r"llama/layers_\d+/mlp/(gate|up|down)_proj$",
    r"llama/layers_\d+/mlp/gate_up_proj$",
)


def quantize_llama_tree_int4(params: Dict, group: int = 128) -> Dict:
    """W4 serving quantization: layer projection kernels -> packed int4
    with group-wise scales (`Int4Dense` structure: kernel_q4p (K/2, N)
    int8 + (K/G, N) scale); lm_head -> per-channel int8 (`Int8Dense`).
    Pair with `LlamaConfig(weight_quant=True, weight_quant_bits=4)`."""
    regexes = [re.compile(p) for p in _QUANT4_PATTERNS]

    def rec(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                if any(r.search(path) for r in regexes) and "kernel" in v:
                    q, s = quantize_kernel_int4(np.asarray(v["kernel"]),
                                                group)
                    rest = {kk: vv for kk, vv in v.items()
                            if kk != "kernel"}
                    out[k] = {"kernel_q4p": jnp.asarray(q),
                              "scale": jnp.asarray(s), **rest}
                else:
                    out[k] = rec(v, path)
            else:
                out[k] = v
        return out

    return rec(quantize_tree(params, (r"lm_head/lm_head$",)))


def quantize_sam_tree(params: Dict) -> Dict:
    """SAM encoder serving quantization (W8A8): qkv/proj/lin1/lin2
    kernels -> int8; pair with `SamEncoderConfig.quant_w8a8=True` so the
    modules also quantize activations dynamically."""
    return quantize_tree(params, SAM_QUANT_PATTERNS)


def quantize_clip_tree(params: Dict) -> Dict:
    """CLIP tower serving quantization (W8A8). `params` must be the
    tower subtree (standalone `ClipVisionTower` params or
    `full_params["vision_tower"]`) — see CLIP_QUANT_PATTERNS."""
    return quantize_tree(params, CLIP_QUANT_PATTERNS)


def tree_bytes(params) -> int:
    return sum(np.asarray(x).nbytes for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Static activation-scale calibration (post-training quantization).
#
# The dynamic per-token absmax in `quant_act` costs a full-tensor reduce
# plus an f32 materialization per quant site (~100 sites in SAM-H, ~150
# in CLIP-L) — measured ~60 ms of the b4 full-scale SAM stage and ~18 ms
# of CLIP. Serving deployments instead calibrate a static per-tensor
# scale per site from a few representative batches (SmoothQuant-style
# W8A8 recipe), turning each quantize into one fused elementwise op.
#
# Flow:
#   model_dyn = Tower(cfg_with(quant_w8a8=True))              # dynamic
#   stats = collect_act_stats(model_dyn, params_q, frames)    # 1+ batches
#   params_s = install_act_scales(params_q, stats)            # adds scales
#   model_st = Tower(cfg_with(quant_w8a8=True, quant_static_act=True))
#   model_st.apply({"params": params_s}, frames)
# ---------------------------------------------------------------------------


def collect_act_stats(module, params: Dict, *args, method=None,
                      **kwargs) -> Dict:
    """Run one calibration forward pass and return the per-site absmax
    tree (`act_stats` collection, sown by the quant sites in
    `models/layers.py`). `module` must be built with dynamic quant
    (`quant_w8a8=True, quant_static_act=False`) so numerics during
    calibration are the real serving numerics."""
    _, var = module.apply({"params": params}, *args,
                          mutable=["act_stats"], method=method, **kwargs)
    return jax.tree.map(lambda x: np.asarray(x), var["act_stats"])


def merge_act_stats(a: Dict, b: Dict) -> Dict:
    """Elementwise max of two stats trees (multi-batch calibration)."""
    return jax.tree.map(np.maximum, a, b)


def install_act_scales(params: Dict, stats: Dict,
                       margin: float = 1.0) -> Dict:
    """Return a copy of `params` with an f32 scalar activation scale
    (absmax/127 * margin) inserted next to each recorded stat.

    Key mapping: a stat leaf named ``<x>absmax`` becomes a param named
    ``<x>act_scale`` at the same tree path (``absmax`` -> ``act_scale``
    inside Int8Dense/conv3d scopes; ``qkv_absmax`` -> ``qkv_act_scale``
    at the SamAttention scope). That is exactly the param the modules
    declare under `quant_static_act=True`."""

    def rec(ptree, stree):
        out = dict(ptree)
        for k, v in stree.items():
            if k.endswith("absmax"):
                amax = float(np.max(np.asarray(v)))
                scale = max(amax / 127.0 * margin, 1e-12)
                out[k.replace("absmax", "act_scale")] = jnp.asarray(
                    scale, jnp.float32)
            elif isinstance(v, dict):
                out[k] = rec(ptree.get(k, {}), v)
        return out

    return rec(params, stats)
