"""Shared flagship serving-model builder for benchmarks.

The 8.42B-parameter reference-scale GROVE (LLaMA-7B-class + CLIP-L/336 +
SAM-H/512) in the best single-chip serving mode measured to date:
packed int4 LLM projections (W4A8: dynamic per-token int8 activations),
W8A8 vision towers with static calibrated activation scales, int8 KV
cache at decode time.

Weights are SYNTHETIC ZEROS built directly in the serving dtypes: a real
fp32 init followed by a cast peaks at fp32+bf16 bytes through the relay
(donation does not reliably free the source) and OOMs the 16 GB chip,
while zeros allocate exactly the final ~5.8 GB — and TPU timing is
value-independent. Every benchmark that uses this builder must stamp
`"weights": "synthetic"` in its report (BASELINE.md provenance rule).
"""

import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp

# Persistent XLA compile cache (same dir as _timing/conftest): the
# flagship inference graphs (SAM/CLIP/prefill/decode at each batch) cost
# minutes of remote compile per shape; without this every e2e/serving
# bench run re-paid all of them cold (the 228 s r4 warm pass, and worse
# at new batches — NOTES_ROUND5).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def flagship_serving_config(tokens=None, fused_qkv: bool = False):
    """GroveConfig at reference scale in the flagship serving mode."""
    from grove_tpu.config import GroveConfig

    cfg = GroveConfig()
    cfg = dataclasses.replace(
        cfg,
        llama=dataclasses.replace(cfg.llama, weight_quant=True,
                                  weight_quant_bits=4, act_quant=True,
                                  fused_qkv=fused_qkv),
        clip=dataclasses.replace(cfg.clip, quant_w8a8=True,
                                 quant_static_act=True),
        sam_enc=dataclasses.replace(cfg.sam_enc, quant_w8a8=True,
                                    quant_static_act=True))
    if tokens is not None:
        cfg = dataclasses.replace(cfg, tokens=tokens)
    return cfg


def build_flagship_serving(tokens=None, fused_qkv: bool = False):
    """(cfg, model, variables) with synthetic zero weights on device."""
    from grove_tpu.models.grove import GroveModel, init_grove_params

    cfg = flagship_serving_config(tokens, fused_qkv)
    shapes = jax.eval_shape(
        lambda r: init_grove_params(cfg, r, dtype=jnp.bfloat16,
                                    batch=1)[1]["params"],
        jax.random.PRNGKey(0))
    tgt = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, jnp.bfloat16
            if a.dtype == jnp.float32 and len(a.shape) > 1 else a.dtype),
        shapes)
    params = jax.jit(lambda: jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype), tgt))()
    # calibrated static scales are 1.0 here (synthetic weights; a zero
    # act_scale would divide by zero — timing is data-independent but
    # the arithmetic must stay finite)
    params = jax.tree_util.tree_map_with_path(
        lambda kp, x: (jnp.ones_like(x)
                       if "act_scale" in str(kp[-1]) else x), params)
    model = GroveModel(cfg, dtype=jnp.bfloat16)
    return cfg, model, {"params": params}


def param_stats(variables) -> dict:
    """{params_b, param_bytes_gb} for the report header."""
    leaves = jax.tree.leaves(variables["params"])
    return {
        "params_b": round(sum(int(np.prod(x.shape))
                              for x in leaves) / 1e9, 2),
        "param_bytes_gb": round(sum(int(np.prod(x.shape)) * x.dtype.itemsize
                                    for x in leaves) / 1e9, 2),
    }
