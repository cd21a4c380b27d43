"""LoRA utilities: merge adapters into base kernels.

Equivalent of `scripts/merge_lora_weights.py`: after (or instead of) LoRA
training, fold every `*_lora/{lora_A,lora_B}` pair into its base projection
kernel so inference/checkpoints need no adapter support. Also normalizes
peft-style torch keys (`base_model.model.` prefix) for the converter.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def merge_lora_params(params: Dict, alpha: float, r: int) -> Dict:
    """Fold flax LoRA trees into the base kernels. Returns a new tree."""
    import jax
    out = jax.tree.map(lambda x: x, params)

    def walk(node):
        if not isinstance(node, dict):
            return
        lora_names = [k for k in list(node.keys()) if k.endswith("_lora")]
        for ln in lora_names:
            base = ln[: -len("_lora")]
            if base not in node:
                continue
            a = np.asarray(node[ln]["lora_A"]["kernel"])  # (in, r)
            b = np.asarray(node[ln]["lora_B"]["kernel"])  # (r, out)
            delta = (a @ b) * (alpha / r)
            node[base]["kernel"] = (
                np.asarray(node[base]["kernel"]) + delta).astype(
                    np.asarray(node[base]["kernel"]).dtype)
            del node[ln]
        for v in node.values():
            walk(v)

    walk(out)
    return out


def normalize_peft_state_dict(sd: Dict[str, np.ndarray],
                              merge: bool = True,
                              alpha: float = 16.0,
                              r: int = 8) -> Dict[str, np.ndarray]:
    """Strip peft prefixes from a torch state dict; optionally merge
    `lora_A/lora_B` pairs into the corresponding base weights
    (peft naming: `...q_proj.lora_A.weight` with base
    `...q_proj.base_layer.weight` or `...q_proj.weight`)."""
    out: Dict[str, np.ndarray] = {}
    loras: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        k = k.replace("base_model.model.", "")
        k = k.replace(".base_layer.", ".")
        if ".lora_A." in k or ".lora_B." in k:
            which = "A" if ".lora_A." in k else "B"
            base = k.split(".lora_")[0] + ".weight"
            loras.setdefault(base, {})[which] = np.asarray(v)
            continue
        k = k.replace(".default.", ".")
        out[k] = np.asarray(v)
    if merge:
        for base, ab in loras.items():
            if "A" in ab and "B" in ab and base in out:
                # torch linear: W (out, in); delta = B @ A
                out[base] = out[base] + (ab["B"] @ ab["A"]) * (alpha / r)
    return out
