"""Vocab-embedding export (equivalent of the reference `embed_tokens.py`).

The reference precomputes a (V, 4096) bf16 tensor of token embeddings so the
generation path can bypass the embed_tokens module
(`embed_tokens.py:66-79`, consumed at `infer_iground.py:553-554`). In the
functional grove_tpu design the table is just a parameter, so this tool is an
export/interop utility: dump the table to .npz (for the torch ecosystem or
external consumers).

Run: python -m grove_tpu.tools.embed_tokens --version ckpt.bin \
         --model_size full --output token_embeddings.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--version", default=None,
                   help="torch .bin checkpoint (optional)")
    p.add_argument("--model_size", default="tiny",
                   choices=["tiny", "small", "full"])
    p.add_argument("--output", default="token_embeddings.npz")
    p.add_argument("--seed", default=42, type=int)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..config import GroveConfig
    from ..models.grove import init_grove_params

    cfg = {"tiny": GroveConfig.tiny, "small": GroveConfig.small,
           "full": GroveConfig}[args.model_size]()
    _, variables = init_grove_params(cfg, jax.random.PRNGKey(args.seed),
                                     dtype=jnp.float32)
    params = variables["params"]
    if args.version and os.path.exists(args.version):
        import torch
        from ..checkpoint.torch_convert import convert_state_dict, merge_into
        from .merge_lora import normalize_peft_state_dict
        sd = torch.load(args.version, map_location="cpu")
        sd = {k: v.float().numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
        sd = normalize_peft_state_dict(sd)
        converted, _ = convert_state_dict(sd, cfg)
        params, _, _ = merge_into(params, converted)

    table = np.asarray(params["embed_tokens"]["embedding"], np.float32)
    np.savez(args.output, token_embeddings=table)
    print(f"wrote ({table.shape[0]}, {table.shape[1]}) embedding table "
          f"to {args.output}")
    return table


if __name__ == "__main__":
    main()
