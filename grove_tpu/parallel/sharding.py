"""Parameter partition rules (Megatron-style TP for the LLM + replication).

Rules are matched on the flattened parameter path ("a/b/c"). The reference
runs pure data-parallel (SURVEY §2.2); the "model" axis here is the optional
TP extension. With model=1 every spec degenerates to replication, so the same
code covers single-chip, DP-only, and DP+TP.

ZeRO-style optimizer-state sharding (the DeepSpeed stage-2 analogue,
`train.py:476-478`) is expressed by sharding the *optimizer state* of
replicated params over the "data" axis — see `zero_sharding`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex on path, PartitionSpec) — first match wins.
LLAMA_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # attention: shard heads (output features of q/k/v, input of o)
    (r"llama/layers_\d+/self_attn/(q|k|v)_proj/kernel", P(None, "model")),
    (r"llama/layers_\d+/self_attn/o_proj/kernel", P("model", None)),
    # mlp: shard intermediate dim
    (r"llama/layers_\d+/mlp/(gate|up)_proj/kernel", P(None, "model")),
    (r"llama/layers_\d+/mlp/down_proj/kernel", P("model", None)),
    # embeddings / head: shard vocab
    (r"embed_tokens/embedding", P("model", None)),
    (r"lm_head/lm_head/kernel", P(None, "model")),
    # vision towers: shard the MLP/attention features where large
    (r"grounding_encoder/blocks_\d+/mlp/lin1/kernel", P(None, "model")),
    (r"grounding_encoder/blocks_\d+/mlp/lin2/kernel", P("model", None)),
    (r"vision_tower/layers_\d+/fc1/kernel", P(None, "model")),
    (r"vision_tower/layers_\d+/fc2/kernel", P("model", None)),
)


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def partition_spec_for(path: str, value, rules=LLAMA_TP_RULES,
                       mesh: Mesh | None = None) -> P:
    for pat, spec in rules:
        if re.search(pat, path):
            if len(spec) > value.ndim:
                continue
            if mesh is not None:
                # drop axes whose mesh size doesn't divide the dim
                ok = all(
                    ax is None or value.shape[i] % mesh.shape[ax] == 0
                    for i, ax in enumerate(spec))
                if not ok:
                    return P()
            return spec
    return P()


def params_shardings(params, mesh: Mesh, rules=LLAMA_TP_RULES):
    """Pytree of NamedSharding matching `params`."""
    def f(path, v):
        return NamedSharding(mesh, partition_spec_for(path_str(path), v,
                                                      rules, mesh))
    return jax.tree_util.tree_map_with_path(f, params)


def zero_sharding(params, mesh: Mesh, rules=LLAMA_TP_RULES):
    """Optimizer-state shardings: replicated params get their first
    axis sharded over "data" when divisible (ZeRO-style); TP-sharded params
    keep their param sharding."""
    ndata = mesh.shape["data"]

    def f(path, v):
        spec = partition_spec_for(path_str(path), v, rules)
        if spec == P() and v.ndim >= 1 and v.shape[0] % ndata == 0 \
                and v.shape[0] >= ndata:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(f, params)


def fsdp_shardings(params, mesh: Mesh, rules=LLAMA_TP_RULES,
                   axis: str = "data", min_size: int = 1 << 14):
    """ZeRO-3-style fully-sharded parameters (the step beyond the
    reference's ZeRO-2, `train.py:476-478`): every parameter with at least
    `min_size` elements is additionally sharded over the data axis on its
    largest TP-unsharded dim. XLA GSPMD inserts the all-gathers at use
    sites and reduce-scatters on the gradients — the TPU-native analogue
    of DeepSpeed stage 3, expressed purely as placement."""
    ndata = mesh.shape[axis]

    def f(path, v):
        spec = list(partition_spec_for(path_str(path), v, rules, mesh))
        spec += [None] * (v.ndim - len(spec))
        if v.size >= min_size and ndata > 1:
            cands = [(v.shape[i], i) for i in range(v.ndim)
                     if spec[i] is None and v.shape[i] % ndata == 0
                     and v.shape[i] >= ndata]
            if cands:
                _, i = max(cands)
                spec[i] = axis
        while spec and spec[-1] is None:
            spec.pop()
        return NamedSharding(mesh, P(*spec))
    return jax.tree_util.tree_map_with_path(f, params)


def sequence_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Activation sharding for Megatron-style sequence parallelism: the
    (B, S, D) residual stream between decoder blocks is sharded over the
    model axis on S, so RMSNorm/elementwise work and activation memory
    scale down with TP size (GSPMD turns the boundary collectives into
    all-gather / reduce-scatter pairs)."""
    return NamedSharding(mesh, P("data", "model", None))


def shard_pytree(tree, shardings):
    """Device-put a pytree with the given shardings."""
    return jax.tree.map(jax.device_put, tree, shardings)
