"""Shared flax building blocks.

Includes the video "SpatioTemporalConvAdapter" used by both vision towers
(reference `modeling_clip.py:591-611` and `image_encoder.py:40-59`): a
zero-init tanh-gated Conv3d residual over (b, t, h, w, c) token grids. At
init alpha == 0 so the adapter is an exact identity — matching the
reference's zero-init gating.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _backend() -> str:
    """`jax.default_backend()`, indirected so tests can monkeypatch the
    kernel-dispatch gates without a TPU (the Pallas kernels themselves
    still pick interpret mode from the real backend)."""
    return jax.default_backend()


def quant_act(x):
    """Dynamic per-token int8 activation quantization.

    x: (..., K) float -> (int8 of same shape, (..., 1) f32 scale) with
    x ~= xq * sx. Used by the W8A8 serving path (`Int8Dense.act_quant`)."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def quant_act_static(x, scale):
    """Static-scale int8 activation quantization: x ~= xq * scale.

    `scale` is a calibrated per-tensor f32 scalar (see
    `ops.quant.install_act_scales`). Unlike `quant_act` there is no
    reduction, so XLA fuses the whole quantize into one elementwise pass
    over x (the dynamic absmax forces a separate full-tensor reduce plus
    an f32 materialization per site — measured ~60 ms of the b4
    full-scale SAM stage, ~18 ms of CLIP)."""
    xf = x.astype(jnp.float32)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _sow_absmax(mod: nn.Module, name: str, x) -> None:
    """Record a per-tensor absmax under the `act_stats` collection when a
    calibration pass made it mutable (`ops.quant.calibrate_act_scales`);
    free otherwise (nothing is traced)."""
    if mod.is_mutable_collection("act_stats"):
        mod.sow("act_stats", name, jnp.max(jnp.abs(x.astype(jnp.float32))),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.zeros((), jnp.float32))


class Int8Dense(nn.Module):
    """int8-weight linear: y = (x @ W_int8) * per-channel scale [+ bias].

    Parameters come from `ops.quant.quantize_tree` (a post-load transform
    of a bf16/f32 checkpoint); init produces placeholder zeros.

    Two serving modes:
    * W8A16 (`act_quant=False`): the kernel is cast to the compute dtype
      on the fly (one layer's kernel at a time), activations stay bf16.
      Halves weight HBM — the win for memory-bound decode.
    * W8A8 (`act_quant=True`): activations are dynamically quantized
      per token (absmax/127) and the product runs as an int8 x int8
      MXU dot with f32 accumulation — measured 345 TOP/s vs 173 TF/s
      bf16 on v5e (2.0x), the win for compute-bound encoder stages.
      f32 accumulation of int8 products is exact up to 2^24; per-token
      sums here stay well under that (K*127^2 ~ 2e7 worst-case at
      K=1280), so accumulation noise is far below quantization noise.
    """
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = False
    act_quant: bool = False
    # static calibrated per-tensor activation scale instead of the
    # dynamic per-token absmax: adds an `act_scale` param (installed by
    # `ops.quant.install_act_scales` after a calibration pass) and turns
    # the quantize into a single fused elementwise op — see
    # `quant_act_static`.
    static_act: bool = False

    @nn.compact
    def __call__(self, x, sx=None):
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        # act_quant applies to multi-token shapes only: a single-token
        # (b, 1, K) decode row is HBM-bound on the (already int8) weights,
        # so quantizing it buys nothing and costs a few extra ops
        # (measured +0.4 ms/step at full scale)
        want_w8a8 = self.act_quant and (x.ndim < 3 or x.shape[-2] > 1)
        if sx is not None or want_w8a8:
            if sx is None:
                _sow_absmax(self, "absmax", x)
                if self.static_act:
                    ascale = self.param("act_scale", nn.initializers.ones,
                                        (), jnp.float32)
                    x, sx = quant_act_static(x, ascale)
                else:
                    x, sx = quant_act(x)
            # else: caller already quantized (e.g. before a layout
            # shuffle, so the cheap int8 bytes move instead of bf16)
            y = jax.lax.dot_general(
                x, kernel_q, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = y * sx * scale
        else:
            y = jax.lax.dot_general(
                x.astype(self.dtype), kernel_q.astype(self.dtype),
                (((x.ndim - 1,), (0,)), ((), ())))
            y = y * scale.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)


class Int4Dense(nn.Module):
    """int4-weight linear with GPTQ-convention group-wise scales.

    y = x @ dequant(W_int4)  with  dequant(W)[k, n] = q4[k, n] * s[g(k), n],
    g(k) = k // group. Parameters come from
    `ops.quant.quantize_llama_tree_int4`; init produces placeholder zeros.
    Weights are stored PACKED, two int4 values per int8 byte
    (`ops.quant.pack_int4` — the relay cannot move `jnp.int4` arrays
    across jit boundaries, and packed bytes carry the same 0.5 B/elem).

    Execution paths, all reading only the packed int4 bytes from HBM:
    * prefill + act_quant (the serving config): Pallas unpack-requant
      kernel (`ops.int4_matmul.int4_requant_int8`) materializes a
      per-channel int8 view, then the plain XLA int8 dot rides the
      MXU's 2x path (the fused W4A8 matmul kernel measured slower
      in-model — see the dispatch comment).
    * prefill, bf16 activations: materialized bf16 view + XLA dot under
      `jax.checkpoint` (compute-bound; the W4A16 Pallas kernel loses the
      MXU bf16 rate to Mosaic's int-acc restriction).
    * decode / few tokens + act_quant: the fused W4A8 Pallas matmul
      (`ops.int4_matmul.int4_matmul_a8`) — per-token int8 activations,
      int8 x int8 dots, unpack in VMEM. The int8 operand halves the
      MXU passes of the weight-stationary dot at tiny M; measured
      9.91 -> 8.12 ms for the b16 32-layer proj stack
      (benchmarks/decode_probe_r4.py; the old "+0.4 ms/step" rejection
      of decode act-quant predates the int8-native unpack and the
      super-group K blocking).
    * decode, bf16 activations: the fused W4A16 Pallas matmul
      (`ops.int4_matmul.int4_matmul`) — unpack + dequantize in VMEM,
      weight-read-bound (0.23 ms vs 1.36 for the XLA grouped einsum at
      the (8,4096)x(4096,11008) shape).

    Accuracy: group-128 round-to-nearest int4 is the standard W4
    serving storage format (GPTQ/AWQ-class); per-channel int8 (Int8Dense)
    remains the conservative default (`LlamaConfig.weight_quant_bits`).
    """
    features: int
    group: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = False
    # W4A8: dynamically int8-quantize multi-token activations so the
    # kernel dot is int8 x int8 (2x the bf16 MXU rate — prefill keeps
    # the W8A8 mode's speed). Decode rows stay bf16 (weight-read-bound).
    act_quant: bool = False

    @nn.compact
    def __call__(self, x, sx=None):
        """`sx` given means `x` is ALREADY per-token int8 (a fused norm
        producer quantized it, x ~= x_int8 * sx) — the int8-view path
        consumes it directly; other paths dequantize and proceed."""
        from ..ops.quant import unpack_int4

        k = x.shape[-1]
        group = self.group
        while group > 1 and k % (2 * group):
            group //= 2                      # tiny test configs
        assert k % (2 * group) == 0, (k, group)
        groups = k // group
        kernel_p = self.param("kernel_q4p", nn.initializers.zeros,
                              (k // 2, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (groups, self.features), jnp.float32)

        lead = x.shape[:-1]
        tokens = 1
        for d in lead:
            tokens *= d
        # Dispatch measured on-chip (benchmarks/int4_probe.py,
        # benchmarks/prefill_breakdown.py); see the class docstring.
        on_tpu = (_backend() == "tpu"
                  and group % 128 == 0 and self.features % 128 == 0)
        if sx is not None and not (on_tpu and tokens >= 64
                                   and self.act_quant):
            # pre-quantized input but no int8-dot path here: dequantize
            # (exact: int8 * its own scale) and continue generic
            x = (x.astype(jnp.float32) * sx).astype(self.dtype)
            sx = None
        # act_quant: multi-token shapes ride the int8 view + XLA dot;
        # decode rows take the fused W4A8 Pallas kernel further down
        if on_tpu and tokens >= 64 and self.act_quant:
            # int8 view + XLA dot: fold the group scales into per-channel
            # int8 and ride the same XLA path as Int8Dense W8A8 (the XLA
            # int8 dot runs at the 345 TOP/s MXU rate). The requant is
            # int32 FIXED POINT — q8 = (q4 * round(256*s_g/s8) + 128)
            # >> 8 — and runs in a one-pass Pallas kernel
            # (`ops.int4_matmul.int4_requant_int8`): the same math as
            # XLA ops compiled to shift/stack/pad fusions materializing
            # padded (sg2, 2, G, N) tiles (~145 ms of a 712 ms b16
            # prefill). The fused W4A8 matmul kernel
            # (`int4_matmul_a8`) was measured and REJECTED for prefill:
            # 214 TF/s per call but 1044 ms vs 712 in-model at b16 —
            # XLA's dot overlaps/pipelines better than the Pallas grid
            # (benchmarks/prefill_breakdown.py). Requant error <= 1 int8
            # LSB on ~0.3% of values, far below the int4 noise;
            # |q4*M| <= 7*round(256*127/7) = 32515 < 2^15, no clip
            # needed.
            from ..ops.int4_matmul import int4_requant_int8
            s8 = jnp.max(scale, axis=0) * (7.0 / 127.0)   # (N,) f32
            mult = jnp.round(scale / s8 * 256.0).astype(jnp.int32)
            q8 = int4_requant_int8(kernel_p, mult)
            if sx is not None:
                xq = x.reshape(tokens, k)
                sxt = sx.reshape(tokens, 1)
            else:
                xq, sxt = quant_act(x.reshape(tokens, k))
            y = jax.lax.dot_general(
                xq, q8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = (y * sxt * s8).reshape(*lead, self.features)
        elif on_tpu and tokens >= 64:
            # bf16 view + XLA dot (compute-bound at prefill shapes).
            # jax.checkpoint so the materialized 2-byte view is
            # RECOMPUTED in the backward, not kept: without it a QLoRA
            # fine-tune keeps all 224 projection views alive for the
            # bwd dots (dx = dy @ view^T) — observed 30 GB peak at full
            # scale. Free in inference (no grad trace).
            dt, feats, kk = self.dtype, self.features, k

            def viewdot(x2d, kp, sc):
                wg = unpack_int4(kp, group)
                deq = (wg.astype(jnp.float32) * sc[:, None, :]).astype(
                    dt).reshape(kk, feats)
                return jax.lax.dot_general(x2d, deq,
                                           (((1,), (0,)), ((), ())))

            y = jax.checkpoint(viewdot)(
                x.astype(dt).reshape(tokens, k), kernel_p, scale)
            y = y.reshape(*lead, self.features)
        elif on_tpu and self.act_quant:
            from ..ops.int4_matmul import int4_matmul_a8
            xq, sxt = quant_act(x.reshape(tokens, k))
            y = int4_matmul_a8(xq, sxt, kernel_p, scale,
                               out_dtype=self.dtype)
            y = y.reshape(*lead, self.features)
        elif on_tpu:
            from ..ops.int4_matmul import int4_matmul
            y = int4_matmul(x.astype(self.dtype).reshape(tokens, k),
                            kernel_p, scale)
            y = y.reshape(*lead, self.features)
        else:
            xg = x.astype(self.dtype).reshape(*lead, groups, group)
            wg = unpack_int4(kernel_p, group)    # (groups, G, N) int8
            y = jnp.einsum("...gk,gkn->...gn", xg, wg.astype(self.dtype),
                           preferred_element_type=jnp.float32)
            y = (y * scale).sum(axis=-2)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


class LayerNormQuant(nn.Module):
    """LayerNorm that emits its output already int8-quantized for the
    W8A8 serving path: (x) -> (xq int8, sx scale).

    Param-compatible with `nn.LayerNorm` ({scale, bias}) so quantized
    checkpoints keep the same tree; owns the site's `act_scale` param in
    static mode. Dynamic mode quantizes per token (bit-identical to the
    previous LN-then-`quant_act` chain); static mode dispatches the
    fused one-pass Pallas kernel (`ops.fused_ln.layernorm_quant`) on
    TPU. Also collapses multi-consumer sites (CLIP's q/k/v all read
    layer_norm1's output) into ONE quantize.
    """
    eps: float = 1e-6
    static_act: bool = False
    use_kernel: bool = False     # Pallas one-pass LN->int8 (static mode)

    @nn.compact
    def __call__(self, x, branch=None):
        """(..., C) float -> (int8, scale), or with `branch` given:
        (resid, int8, scale) where resid = x + branch and the int8 is the
        quantized LN of resid.

        The branch form exists because fusing the LN alone measured a
        WASH at full scale (see `ops.fused_ln`): the residual add, the
        clamp chain, and the pallas boundary copies stayed outside. In
        static serving mode the branch form dispatches the one-pass
        add+LN+quant kernel that subsumes all of it.
        """
        c = x.shape[-1]
        g = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.static_act and not self.is_mutable_collection("act_stats"):
            from ..ops.fused_ln import add_layernorm_quant, layernorm_quant

            ascale = self.param("act_scale", nn.initializers.ones,
                                (), jnp.float32)
            if branch is not None:
                resid, q = add_layernorm_quant(x, branch, g, b, ascale,
                                               eps=self.eps)
                return resid, q, ascale
            return layernorm_quant(x, g, b, ascale, eps=self.eps,
                                   use_kernel=self.use_kernel), ascale
        # dynamic path (also the calibration pass: stats are the
        # NORMALIZED output's absmax, matching what static mode scales)
        resid = x if branch is None else x + branch.astype(x.dtype)
        xf = resid.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        d = xf - mu
        var = (d * d).mean(-1, keepdims=True)
        y = d * jax.lax.rsqrt(var + self.eps) * g + b
        _sow_absmax(self, "absmax", y)
        if self.static_act:
            ascale = self.param("act_scale", nn.initializers.ones,
                                (), jnp.float32)
            out = quant_act_static(y, ascale)
        else:
            out = quant_act(y)
        if branch is not None:
            return (resid,) + out
        return out


class RMSNorm(nn.Module):
    """LLaMA RMSNorm; stats in fp32.

    `quant_dyn=True` (W8A8 serving prefill) dispatches the one-pass
    add+RMSNorm+dynamic-int8 kernel (`ops.fused_ln.add_rmsnorm_quant_dyn`)
    and returns (resid, q8, sx) with resid = x + branch — the XLA chain
    runs this as four passes per norm site. Param tree is unchanged."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, branch=None, quant_dyn: bool = False):
        dtype = x.dtype
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        if quant_dyn:
            from ..ops.fused_ln import add_rmsnorm_quant_dyn
            return add_rmsnorm_quant_dyn(x, branch, w, eps=self.eps)
        if branch is not None:
            x = x + branch.astype(dtype)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = xf * jax.lax.rsqrt(var + self.eps)
        return (out * w).astype(dtype)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature maps (reference
    `model/SAM/modeling/common.py` LayerNorm2d, which normalizes channels)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):  # (..., C)
        dtype = x.dtype
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        out = (xf - mu) / jnp.sqrt(var + self.eps)
        return (out * w + b).astype(dtype)


class MLP(nn.Module):
    """relu-MLP stack (SAM `mask_decoder.py:232-254` MLP)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MLPBlock(nn.Module):
    """SAM MLPBlock: Dense -> act -> Dense (`common.py` MLPBlock)."""
    mlp_dim: int
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32
    quant_w8a8: bool = False      # int8 W8A8 serving mode (see Int8Dense)
    static_act: bool = False      # calibrated static act scales

    @nn.compact
    def __call__(self, x, sx=None):
        d = x.shape[-1]
        if self.quant_w8a8:
            x = Int8Dense(self.mlp_dim, dtype=self.dtype, use_bias=True,
                          act_quant=True, static_act=self.static_act,
                          name="lin1")(x, sx)
            x = self.act(x)
            return Int8Dense(d, dtype=self.dtype, use_bias=True,
                             act_quant=True, static_act=self.static_act,
                             name="lin2")(x)
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = self.act(x)
        return nn.Dense(d, dtype=self.dtype, name="lin2")(x)


class SpatioTemporalConvAdapter(nn.Module):
    """Gated 3-D conv video adapter: x + tanh(alpha) * relu(conv3d(x)).

    Input: (b, t, h, w, c) token grid (channels-last; the reference permutes
    to b c t h w for torch Conv3d — numerics identical). alpha is zero-init
    so the module starts as identity.
    """
    kernel: Tuple[int, int, int] = (3, 3, 3)
    dtype: jnp.dtype = jnp.float32
    quant_w8a8: bool = False      # int8 taps + per-tensor act scale
    static_act: bool = False      # calibrated static act scales

    @nn.compact
    def __call__(self, x):  # (b, t, h, w, c)
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.zeros, (1,), jnp.float32)
        y = _Conv3dShifts(c, self.kernel, dtype=self.dtype,
                          quant_w8a8=self.quant_w8a8,
                          static_act=self.static_act, name="conv3d")(x)
        y = nn.relu(y)
        return (jnp.tanh(alpha).astype(x.dtype) * y + x).astype(x.dtype)


class _Conv3dShifts(nn.Module):
    """SAME-padded dense Conv3d as a sum of shifted (N, C) x (C, C) dots.

    The XLA Conv3d lowering of the 3x3x3 C->C adapter conv measures
    25.7 ms at SAM-H/32-frame shapes vs 21.9 for accumulating one matmul
    per kernel tap over shifted slices (benchmarks/sam_global_probe.py) —
    each tap is a full-width MXU dot and the f32 accumulator replaces the
    conv's im2col layout work. Param tree, initializers, and the RNG fold
    path match nn.Conv ({kernel: (kt, kh, kw, in, out), bias}), so
    checkpoints convert unchanged.
    """
    features: int
    kernel: Tuple[int, int, int]
    dtype: jnp.dtype
    quant_w8a8: bool = False
    static_act: bool = False

    @nn.compact
    def __call__(self, x):  # (b, t, h, w, c)
        cin = x.shape[-1]
        kt, kh, kw = self.kernel
        if self.quant_w8a8:
            return self._quant_call(x, cin, kt, kh, kw)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kt, kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        b, t, hh, ww, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (kt // 2, kt - 1 - kt // 2),
                         (kh // 2, kh - 1 - kh // 2),
                         (kw // 2, kw - 1 - kw // 2), (0, 0)))
        out = jnp.zeros((b, t, hh, ww, self.features), jnp.float32)
        for dt_ in range(kt):
            for dh in range(kh):
                for dw in range(kw):
                    sl = jax.lax.dynamic_slice(
                        xp, (0, dt_, dh, dw, 0), (b, t, hh, ww, cin))
                    out = out + jnp.einsum(
                        "bthwc,cd->bthwd", sl, kernel[dt_, dh, dw],
                        preferred_element_type=jnp.float32)
        return out.astype(x.dtype) + bias

    def _quant_call(self, x, cin, kt, kh, kw):
        """W8A8 taps: int8 kernel (per-output-channel scale over all
        taps) x int8 activations with one PER-TENSOR scale — a per-token
        scale would shift with each tap and could not factor out of the
        27-tap accumulation, costing 27 full-size f32 multiplies."""
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (kt, kh, kw, cin, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        b, t, hh, ww, _ = x.shape
        _sow_absmax(self, "absmax", x)
        if self.static_act:
            sx = self.param("act_scale", nn.initializers.ones,
                            (), jnp.float32)
            xq, _ = quant_act_static(x, sx)
        else:
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        xp = jnp.pad(xq, ((0, 0), (kt // 2, kt - 1 - kt // 2),
                          (kh // 2, kh - 1 - kh // 2),
                          (kw // 2, kw - 1 - kw // 2), (0, 0)))
        # the 27-tap chain accumulates in bf16: each tap's int8 dot is
        # exact (f32 accumulate inside the dot), only the running sum
        # rounds — sqrt(27)*2^-9 ~ 1% worst-case, far below the int8
        # activation noise — and the accumulator read/write churn (the
        # dominant HBM traffic of the adapters: profiled 225 ms of
        # convolution_add_fusion at b16, ~24% of SAM's FLOPs) halves
        acc_dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        out = jnp.zeros((b, t, hh, ww, self.features), acc_dt)
        for dt_ in range(kt):
            for dh in range(kh):
                for dw in range(kw):
                    sl = jax.lax.dynamic_slice(
                        xp, (0, dt_, dh, dw, 0), (b, t, hh, ww, cin))
                    out = out + jnp.einsum(
                        "bthwc,cd->bthwd", sl, kernel_q[dt_, dh, dw],
                        preferred_element_type=jnp.float32).astype(acc_dt)
        return ((out.astype(jnp.float32) * sx) * scale
                + bias).astype(x.dtype)


def adaptive_avg_pool_1d(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    """torch-compatible AdaptiveAvgPool along one axis.

    torch semantics: output bin i averages input[floor(i*L/out) :
    ceil((i+1)*L/out)]. Implemented as a (out, L) averaging matmul so it
    stays MXU-friendly and differentiable.
    """
    length = x.shape[axis]
    import numpy as np
    starts = (np.arange(out_size) * length) // out_size
    ends = -(-((np.arange(out_size) + 1) * length) // out_size)  # ceil
    w = np.zeros((out_size, length), np.float32)
    for i, (s, e) in enumerate(zip(starts, ends)):
        w[i, s:e] = 1.0 / (e - s)
    wj = jnp.asarray(w, x.dtype)
    x_moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("...l,ol->...o", x_moved, wj)
    return jnp.moveaxis(out, -1, axis)


def adaptive_avg_pool_3d(x: jax.Array, out_thw: Tuple[int, int, int],
                         axes: Tuple[int, int, int] = (1, 2, 3)) -> jax.Array:
    """AdaptiveAvgPool3d((t,h,w)) over the given axes of x."""
    for size, axis in zip(out_thw, axes):
        x = adaptive_avg_pool_1d(x, size, axis)
    return x
