"""Decode-path projection fusion: q/k/v -> qkv, gate/up -> gate_up.

At decode (1 token/step) each LLaMA layer runs several skinny matmuls;
fusing the independent projections into one wide kernel keeps the MXU
busier per launch and lets XLA read the activations once. The fusion is a
pure PARAMETER-LAYOUT transform — output columns of a matmul are
independent dot products, so concatenating kernels along the output axis
is bit-identical to running the projections separately. Checkpoints stay
in the unfused (reference/HF) layout; fuse at load time:

    cfg  = dataclasses.replace(cfg, llama=replace(cfg.llama, fused_qkv=True))
    params = fuse_llama_projections(params)

Works for bf16 (`{"kernel"}`), weight-only-int8 (`{"kernel_q", "scale"}`,
per-OUTPUT-channel scales) and group-wise int4 (`{"kernel_q4p", "scale"}`,
(G, N) scales) — concatenation along the output axis keeps every
channel's (and group-column's) scale aligned. LoRA deltas are
unaffected (they add to the split q/v slices). Note: the tensor-parallel
rules target the unfused names; `fused_qkv` is a single-chip decode mode.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np


def _concat_dense(parts: Sequence[Dict]) -> Dict:
    """Concatenate Dense/Int8Dense param dicts along the output axis."""
    keys = set(parts[0])
    for p in parts:
        if set(p) != keys:
            raise ValueError(f"mismatched dense params: {set(p)} vs {keys}")
    out = {}
    if "kernel" in keys:
        out["kernel"] = jnp.concatenate([p["kernel"] for p in parts], axis=1)
    if "kernel_q" in keys:
        out["kernel_q"] = jnp.concatenate([p["kernel_q"] for p in parts],
                                          axis=1)
    if "kernel_q4p" in keys:
        out["kernel_q4p"] = jnp.concatenate([p["kernel_q4p"] for p in parts],
                                           axis=1)
    if "scale" in keys:
        # per-output-channel int8 scales are (N,); group-wise int4 scales
        # are (G, N) — the output axis is last in both
        out["scale"] = jnp.concatenate([p["scale"] for p in parts],
                                       axis=parts[0]["scale"].ndim - 1)
    if "bias" in keys:
        out["bias"] = jnp.concatenate([p["bias"] for p in parts], axis=0)
    leftover = keys - set(out)
    if leftover:
        raise ValueError(f"unhandled dense param entries: {leftover}")
    return out


def fuse_llama_projections(params: Dict) -> Dict:
    """GroveModel (or bare LlamaModel) param tree, unfused -> fused.

    Returns a copy where every `llama/layers_*/self_attn` has q/k/v_proj
    replaced by `qkv_proj` and every `mlp` has gate/up_proj replaced by
    `gate_up_proj`. Idempotent on already-fused trees.
    """
    def rec(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        # LLaMA-exact signatures: CLIP attention also has q/k/v_proj but
        # pairs them with "out_proj" (HF CLIP naming) and its MLP is
        # fc1/fc2 — requiring the o_proj / down_proj siblings keeps the
        # vision towers untouched
        if {"q_proj", "k_proj", "v_proj", "o_proj"} <= set(tree):
            out["qkv_proj"] = _concat_dense(
                [tree["q_proj"], tree["k_proj"], tree["v_proj"]])
            rest = {k: v for k, v in tree.items()
                    if k not in ("q_proj", "k_proj", "v_proj")}
        elif {"gate_proj", "up_proj", "down_proj"} <= set(tree):
            out["gate_up_proj"] = _concat_dense(
                [tree["gate_proj"], tree["up_proj"]])
            rest = {k: v for k, v in tree.items()
                    if k not in ("gate_proj", "up_proj")}
        else:
            rest = tree
        for k, v in rest.items():
            out[k] = rec(v)
        return out

    return rec(params)


def unfuse_llama_projections(params: Dict, cfg) -> Dict:
    """Inverse transform (for saving back in the reference/HF layout).

    `cfg` is the LlamaConfig (the split points depend on head counts)."""
    hd = cfg.head_dim
    nq, nkv = cfg.num_heads * hd, cfg.num_kv_heads * hd
    inter = cfg.intermediate_size

    def split_dense(d: Dict, sizes, names):
        offs = np.cumsum([0] + list(sizes))
        outs = [{} for _ in names]
        for key, v in d.items():
            if key in ("kernel", "kernel_q", "kernel_q4p"):
                axis = 1
            elif key == "scale":
                axis = v.ndim - 1       # (N,) int8 or (G, N) int4
            else:
                axis = 0
            for i in range(len(names)):
                sl = [slice(None)] * v.ndim
                sl[axis] = slice(int(offs[i]), int(offs[i + 1]))
                outs[i][key] = v[tuple(sl)]
        return dict(zip(names, outs))

    def rec(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if k == "qkv_proj":
                out.update(split_dense(v, (nq, nkv, nkv),
                                       ("q_proj", "k_proj", "v_proj")))
            elif k == "gate_up_proj":
                out.update(split_dense(v, (inter, inter),
                                       ("gate_proj", "up_proj")))
            else:
                out[k] = rec(v)
        return out

    return rec(params)
