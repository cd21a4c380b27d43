"""GPipe-style pipeline parallelism for the LLaMA decoder stack.

The reference scales only by data parallelism (DeepSpeed ZeRO-2,
`train.py:466-487`); pipeline parallelism is a capability it lacks. The
TPU-native formulation here follows the canonical JAX pattern: the per-layer
block parameters are stacked along a leading "layer" axis and sharded over a
"pipe" mesh axis, and a `shard_map` runs the classic GPipe schedule — at
step t, stage k processes microbatch t-k and hands its activation to stage
k+1 with `jax.lax.ppermute` over ICI. The whole schedule is a `lax.scan`,
so it is a single XLA program, differentiable end-to-end (ppermute/scan
both have transposes), and compiles once.

Scope: the cache-free (training / teacher-forced) LLM path — exactly where
pipeline parallelism pays. Greedy KV-cache decode stays DP/TP (a pipelined
decode would serialize on the token loop anyway).

Layout notes
  * stacked block params: each leaf (L, ...) sharded P("pipe") on dim 0,
    so a stage holds L/n_stages layers locally and scans over them.
  * microbatched input (M, mb, S, D) is passed replicated; only stage 0
    reads it. Outputs are materialized on the last stage and broadcast
    with a masked psum. For a production run with huge activations, feed
    inputs through a host iterator per step instead; at GROVE scale
    (B*S*D activations ~ MBs) the replicated queue is the simpler win.
  * bubble fraction is (S-1)/(M+S-1); choose M >= 4*S for <20% bubble.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import LlamaConfig
from ..models.layers import RMSNorm
from ..models.llama import LlamaBlock


def stack_block_params(llama_params: Dict, num_layers: int) -> Tuple:
    """Split LlamaModel params into (stacked block params, rest).

    Stacked leaves get a new leading axis of size `num_layers`; `rest`
    holds the final-norm (and any non-layer) params unchanged."""
    layers = [llama_params[f"layers_{i}"] for i in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    rest = {k: v for k, v in llama_params.items()
            if not k.startswith("layers_")}
    return stacked, rest


def unstack_block_params(stacked, num_layers: int) -> Dict:
    """Inverse of `stack_block_params` (without `rest`)."""
    return {f"layers_{i}": jax.tree.map(lambda x: x[i], stacked)
            for i in range(num_layers)}


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert n_stages <= len(devices), (n_stages, len(devices))
    import numpy as np
    return Mesh(np.asarray(devices[:n_stages]), ("pipe",))


def pipelined_llama_forward(cfg: LlamaConfig, llama_params: Dict,
                            inputs_embeds: jax.Array, positions: jax.Array,
                            mesh: Mesh, n_microbatches: int,
                            dtype=jnp.bfloat16, axis_name: str = "pipe",
                            remat: bool = False):
    """Post-final-norm hidden states, computed with the stack pipelined
    over `mesh`'s `axis_name` axis.

    inputs_embeds: (B, S, D) with B divisible by n_microbatches;
    positions: (S,) shared across the batch. Numerically equivalent to
    `LlamaModel.apply` on the same params (tested)."""
    n_stages = mesh.shape[axis_name]
    L = cfg.num_layers
    assert L % n_stages == 0, (L, n_stages)
    b, s, d = inputs_embeds.shape
    m = n_microbatches
    assert b % m == 0, (b, m)

    stacked, rest = stack_block_params(llama_params, L)
    mb_x = inputs_embeds.astype(dtype).reshape(m, b // m, s, d)
    block = LlamaBlock(cfg, dtype=dtype)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=P(),
        check_vma=False)
    def run(stacked_local, mb_local, pos):
        stage = jax.lax.axis_index(axis_name)

        def apply_local(x):
            def layer_body(x, p):
                y, _ = block.apply({"params": p}, x, pos)
                return y, None
            if remat:
                layer_body = jax.checkpoint(layer_body,
                                            prevent_cse=False)
            x, _ = jax.lax.scan(layer_body, x, stacked_local)
            return x

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        t_total = m + n_stages - 1

        def step_fn(carry, t):
            state, outputs = carry
            inp = jax.lax.dynamic_index_in_dim(
                mb_local, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            x = jnp.where(stage == 0, inp, state)
            y = apply_local(x)
            out_idx = t - (n_stages - 1)
            write = (stage == n_stages - 1) & (out_idx >= 0)
            safe = jnp.clip(out_idx, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, safe, 0,
                                               keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, y, cur), safe, 0)
            state = jax.lax.ppermute(y, axis_name, perm)
            return (state, outputs), None

        init = (jnp.zeros(mb_local.shape[1:], dtype),
                jnp.zeros_like(mb_local))
        (_, outputs), _ = jax.lax.scan(step_fn, init, jnp.arange(t_total))
        # outputs live on the last stage; broadcast via masked psum
        outputs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outputs,
                      jnp.zeros_like(outputs)), axis_name)
        return outputs

    out = run(stacked, mb_x, positions)
    x = out.reshape(b, s, d)
    return RMSNorm(eps=cfg.rms_norm_eps).apply(
        {"params": rest["norm"]}, x)
