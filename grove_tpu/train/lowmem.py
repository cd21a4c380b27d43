"""Low-memory optimizer pieces for single-chip fine-tuning at full scale.

The reference fine-tunes GROVE on 16x8 GPUs with DeepSpeed ZeRO-2
(`train.py:466-487`, `train_scripts/train_howtoground.sh:4-5`) — optimizer
state is the reason it cannot fit fewer devices. On TPU the same recipe
(frozen backbones + adapters/heads/LoRA trainable, `train.py:234-334`)
fits ONE v5e chip if the big byte consumers shrink:

  * frozen backbone weights     -> int4/int8 serving quantization
    (QLoRA-style: quantized frozen base, bf16 trainable deltas; the
    quantized forward is differentiable w.r.t. activations because only
    the weights are integer)
  * AdamW moments (8 B/param)   -> bf16 (4 B/param) via `adamw_bf16`
  * master params + grads       -> bf16 with STOCHASTIC ROUNDING on the
    update (`apply_updates_sr`) so sub-LSB updates accumulate in
    expectation instead of vanishing (the standard TPU recipe for
    bf16-master training; plain bf16 masters silently drop any update
    smaller than ~0.4% of the param magnitude)

Composition lives in `benchmarks/train_finetune_scale.py` and the train
driver's `--moment_dtype bf16` / `--sr` flags.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ScaleByAdamCompactState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam_compact(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8,
                          moment_dtype=jnp.bfloat16):
    """Adam moment estimation with moments STORED in `moment_dtype`.

    Math runs in f32 every step (decay, update, bias correction); only
    the carried state is cast down. bf16 keeps the full f32 exponent
    range, so `nu` (second moment, huge dynamic range) never flushes to
    zero the way an int8/absmax scheme can — precision on the moments is
    ~0.4%, noise far below gradient noise. Halves Adam's 8 B/param.
    """

    def init_fn(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=moment_dtype), params)
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=moment_dtype), params)
        return ScaleByAdamCompactState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        cf = count.astype(jnp.float32)

        def upd(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32
            mhat = m32 / (1 - b1 ** cf)
            vhat = v32 / (1 - b2 ** cf)
            out = mhat / (jnp.sqrt(vhat) + eps)
            return out, m32.astype(moment_dtype), v32.astype(moment_dtype)

        flat_u, tdef = jax.tree_util.tree_flatten(updates)
        flat_m = tdef.flatten_up_to(state.mu)
        flat_v = tdef.flatten_up_to(state.nu)
        outs = [upd(g, m, v) for g, m, v in zip(flat_u, flat_m, flat_v)]
        new_u = tdef.unflatten([o[0] for o in outs])
        new_m = tdef.unflatten([o[1] for o in outs])
        new_v = tdef.unflatten([o[2] for o in outs])
        return new_u, ScaleByAdamCompactState(count=count, mu=new_m,
                                              nu=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_bf16(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 0.0,
               grad_clip: Optional[float] = None,
               moment_dtype=jnp.bfloat16):
    """AdamW with `moment_dtype` moments — drop-in for the optax.adamw
    chain in `train.step.make_optimizer` at half the state bytes."""
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(scale_by_adam_compact(b1=b1, b2=b2, eps=eps,
                                       moment_dtype=moment_dtype))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def apply_updates_sr(params, updates, rng):
    """`optax.apply_updates` with STOCHASTIC ROUNDING into the params'
    (low-precision) dtype.

    p_new = round_sr(p + u) where round_sr rounds up with probability
    proportional to the remainder below the target-precision LSB —
    unbiased (E[p_new] == p + u exactly), so tiny updates accumulate
    across steps instead of being swallowed by round-to-nearest.
    Implementation: add uniform noise in [0, 1) ulp to the f32 mantissa
    bits below bf16 precision, then truncate to bf16 (the classic
    bit-trick: bf16 is f32's top 16 bits, so adding U[0, 2^16) to the
    raw f32 bits and truncating is exact SR for finite values).
    Only f32->bf16 params take the SR path; other dtypes fall back to a
    plain cast-free add.
    """
    flat_p, tdef = jax.tree_util.tree_flatten(params)
    flat_u = tdef.flatten_up_to(updates)
    keys = jax.random.split(rng, max(len(flat_p), 1))

    def one(p, u, key):
        if u is None:
            return p
        if p.dtype != jnp.bfloat16:
            return (p + u.astype(p.dtype)).astype(p.dtype)
        x = p.astype(jnp.float32) + u.astype(jnp.float32)
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        noise = jax.random.bits(key, x.shape, dtype=jnp.uint32) & jnp.uint32(
            0xFFFF)
        rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(
            rounded, jnp.float32).astype(jnp.bfloat16)

    return tdef.unflatten(
        [one(p, u, k) for p, u, k in zip(flat_p, flat_u, keys)])
