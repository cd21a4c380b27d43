"""Fused LayerNorm -> static int8 quantize, one HBM pass.

In the W8A8-static serving path every transformer block runs
LayerNorm -> quantize before its projections. XLA lowers that as three
passes over the activation (a stats reduce, a normalize-apply fusion,
and a clamp/convert fusion — profiled ~44 ms of reduces plus ~59 ms of
clamp_convert in the b4 SAM-H stage), because a reduce cannot fuse with
consumers of its own input. This kernel does all of it in one pass:
read bf16, f32 row stats in VMEM, normalize, scale by the calibrated
activation scale, write int8 — 3 bytes/element of traffic instead of 9.

The calibrated act_scale folds into gamma/beta OUTSIDE the kernel
(C-sized host math): q = clip(round((x-mu)*rsqrt(var+eps) * (g/s) +
(b/s))), so the kernel needs no scalar plumbing.

Reference analogue: none (the reference serves bf16 via HF/torch;
LayerNorm semantics from `image_encoder.py` / `modeling_clip.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _add_kernel(a_ref, b_ref, g_ref, bt_ref, r_ref, q_ref, *, eps: float):
    r = a_ref[...] + b_ref[...]          # residual add in the input dtype
    r_ref[...] = r
    xf = r.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    d = xf - mu
    var = jnp.mean(d * d, axis=1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps) * g_ref[...] + bt_ref[...]
    q_ref[...] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def add_layernorm_quant(a, b, gamma, beta, act_scale, *, eps: float = 1e-6,
                        block_rows: int = 512, use_kernel: bool = True):
    """Residual add + LayerNorm + static int8 quant, ONE HBM pass.

    Returns (resid, q) with resid = a + b (a's dtype) and
    ln(resid) ~= q * act_scale.

    Why this exists when `layernorm_quant` alone measured a WASH at full
    scale: the isolated LN kernel leaves the residual add, the clamp
    chain, and the pallas boundary copies OUTSIDE (profiled b16 SAM:
    kernels 47 ms but +49 ms bare adds, +152 ms clamp_converts, +106 ms
    copies — net zero). Subsuming the add and emitting BOTH outputs
    leaves nothing to materialize around the site: traffic is
    read a + read b + write resid + write int8 = 4.5 B/elem vs the XLA
    chain's measured ~5.5 ms/site (~350 ms of the 2055 ms b16 SAM
    stage across the 64 norm sites).
    """
    c = a.shape[-1]
    gs = (gamma / act_scale).astype(jnp.float32)
    bs = (beta / act_scale).astype(jnp.float32)
    if use_kernel and c % 128 == 0:
        lead = a.shape[:-1]
        n = 1
        for d_ in lead:
            n *= d_
        a2 = a.reshape(n, c)
        b2 = b.reshape(n, c).astype(a.dtype)
        grid = (pl.cdiv(n, block_rows),)
        resid, q = pl.pallas_call(
            functools.partial(_add_kernel, eps=eps),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
                pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
                pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, c), a.dtype),
                jax.ShapeDtypeStruct((n, c), jnp.int8),
            ],
            interpret=jax.default_backend() != "tpu",
        )(a2, b2, gs.reshape(1, c), bs.reshape(1, c))
        return resid.reshape(*lead, c), q.reshape(*lead, c)
    resid = a + b.astype(a.dtype)
    xf = resid.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    d = xf - mu
    var = (d * d).mean(-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps) * gs + bs
    return resid, jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _add_rms_kernel(a_ref, b_ref, g_ref, r_ref, q_ref, s_ref, *,
                    eps: float):
    r = a_ref[...] + b_ref[...]          # residual add in the input dtype
    r_ref[...] = r
    _rms_quant_body(r, g_ref, q_ref, s_ref, eps)


def _rms_kernel(a_ref, g_ref, q_ref, s_ref, *, eps: float):
    _rms_quant_body(a_ref[...], g_ref, q_ref, s_ref, eps)


def _rms_quant_body(r, g_ref, q_ref, s_ref, eps: float):
    xf = r.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * g_ref[...]
    amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-9) * (1.0 / 127.0)
    q_ref[...] = jnp.clip(jnp.round(y * (1.0 / scale)),
                          -127, 127).astype(jnp.int8)
    s_ref[...] = scale


def add_rmsnorm_quant_dyn(a, branch, weight, *, eps: float = 1e-6,
                          block_rows: int = 0, use_kernel: bool = True):
    """Residual add + RMSNorm + DYNAMIC per-token int8 quant, one pass.

    The LLaMA W8A8 serving prefill ran this as four XLA passes per norm
    site (residual add+convert, rsqrt-multiply, absmax reduce,
    clamp/convert — profiled ~119 ms of a 657 ms b16 prefill across the
    64 sites). Returns (resid, q8, sx) with resid = a + branch (a's
    dtype) and rmsnorm(resid) ~= q8 * sx, sx per token ((..., 1) f32).

    With `branch=None` the add is skipped and resid is `a` unchanged
    (first block / post-materialization sites)."""
    c = a.shape[-1]
    g = weight.astype(jnp.float32)
    if use_kernel and c % 128 == 0:
        if not block_rows:
            # scoped VMEM budget: double-buffered bf16 I/O (a, branch,
            # resid, q8 ~ 14C B/row) + f32 stats temps (8C B/row);
            # 256 rows still hit 20.03M > 16M at C=4096 (LLaMA hidden).
            # Target ~2 MB of f32 temp, rounded down to a power of two
            # (sublane-aligned blocks): C=4096 -> 128, C<=2048 -> 256+.
            block_rows = max(64, min(512, (1 << 21) // (4 * c)))
            block_rows = 1 << (block_rows.bit_length() - 1)
        lead = a.shape[:-1]
        n = 1
        for d_ in lead:
            n *= d_
        a2 = a.reshape(n, c)
        grid = (pl.cdiv(n, block_rows),)
        interp = jax.default_backend() != "tpu"
        row_spec = pl.BlockSpec((block_rows, c), lambda i: (i, 0))
        g_spec = pl.BlockSpec((1, c), lambda i: (0, 0))
        q_shapes = [jax.ShapeDtypeStruct((n, c), jnp.int8),
                    jax.ShapeDtypeStruct((n, 1), jnp.float32)]
        q_specs = [row_spec, pl.BlockSpec((block_rows, 1), lambda i: (i, 0))]
        if branch is None:
            q, sx = pl.pallas_call(
                functools.partial(_rms_kernel, eps=eps),
                grid=grid, in_specs=[row_spec, g_spec],
                out_specs=q_specs, out_shape=q_shapes,
                interpret=interp)(a2, g.reshape(1, c))
            return a, q.reshape(*lead, c), sx.reshape(*lead, 1)
        b2 = branch.reshape(n, c).astype(a.dtype)
        resid, q, sx = pl.pallas_call(
            functools.partial(_add_rms_kernel, eps=eps),
            grid=grid, in_specs=[row_spec, row_spec, g_spec],
            out_specs=[row_spec] + q_specs,
            out_shape=[jax.ShapeDtypeStruct((n, c), a.dtype)] + q_shapes,
            interpret=interp)(a2, b2, g.reshape(1, c))
        return (resid.reshape(*lead, c), q.reshape(*lead, c),
                sx.reshape(*lead, 1))
    resid = a if branch is None else a + branch.astype(a.dtype)
    xf = resid.astype(jnp.float32)
    var = (xf * xf).mean(-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * g
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-9) / 127.0
    q = jnp.clip(jnp.round(y / sx), -127, 127).astype(jnp.int8)
    return resid, q, sx


def _kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    d = xf - mu
    var = jnp.mean(d * d, axis=1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps) * g_ref[...] + b_ref[...]
    o_ref[...] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def layernorm_quant(x, gamma, beta, act_scale, *, eps: float = 1e-6,
                    block_rows: int = 1024, use_kernel: bool = False):
    """LayerNorm over the last axis (f32 stats) then static int8 quant.

    x: (..., C) float; gamma/beta: (C,) f32; act_scale: f32 scalar.
    Returns int8 of x's shape with ln(x) ~= out * act_scale.

    Dispatch note (measured at full scale): the Pallas kernel wins IN
    ISOLATION (0.11 ms vs 0.28 for the XLA chain at 32768x1280,
    benchmarks/ln_probe.py), but IN-GRAPH it is a fusion barrier — the
    preceding residual add can no longer fuse into the stats pass and
    CLIP regressed 591 -> 667 ms — so the default is the XLA chain and
    `use_kernel` stays opt-in for isolated/streaming uses.
    """
    c = x.shape[-1]
    gs = (gamma / act_scale).astype(jnp.float32)
    bs = (beta / act_scale).astype(jnp.float32)
    if use_kernel and c % 128 == 0:
        lead = x.shape[:-1]
        n = 1
        for d_ in lead:
            n *= d_
        x2 = x.reshape(n, c)
        grid = (pl.cdiv(n, block_rows),)
        out = pl.pallas_call(
            functools.partial(_kernel, eps=eps),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, c), jnp.int8),
            interpret=jax.default_backend() != "tpu",
        )(x2, gs.reshape(1, c), bs.reshape(1, c))
        return out.reshape(*lead, c)
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    d = xf - mu
    var = (d * d).mean(-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps) * gs + bs
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
