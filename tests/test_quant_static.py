"""Static calibrated activation scales (post-training quantization).

The W8A8 serving mode's dynamic per-token absmax costs a full-tensor
reduce + f32 materialization per quant site (measured ~60 ms of the b4
full-scale SAM stage, ~18 ms of CLIP). `quant_static_act` replaces it
with a per-tensor scale calibrated from representative batches
(`ops.quant.collect_act_stats` -> `install_act_scales`). These tests pin
the calibration flow end-to-end on both vision towers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from grove_tpu.config import ClipVisionConfig, SamEncoderConfig
from grove_tpu.models.clip import ClipVisionTower
from grove_tpu.models.sam_encoder import SamImageEncoder
from grove_tpu.ops.quant import (collect_act_stats, install_act_scales,
                                 merge_act_stats, quantize_clip_tree,
                                 quantize_sam_tree)


def _with(cfg, **kw):
    return type(cfg)(**{**cfg.__dict__, **kw})


def _noise(variables, seed):
    r = np.random.default_rng(seed)
    return jax.tree.map(
        lambda x: x + 0.05 * jnp.asarray(r.normal(size=x.shape), x.dtype),
        variables)


def _rel(a, b):
    return (np.linalg.norm(np.asarray(a, np.float64)
                           - np.asarray(b, np.float64))
            / max(np.linalg.norm(np.asarray(b, np.float64)), 1e-9))


def test_sam_static_act_calibration(rng):
    """Calibrate SAM-tiny: stats recorded at every quant site, scales
    installed at the documented key names, static forward stays within
    quantization noise of the bf16 forward (same order as dynamic)."""
    cfg = SamEncoderConfig.tiny()
    enc = SamImageEncoder(cfg=cfg, dtype=jnp.float32)
    frames = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3))
                         .astype(np.float32))
    variables = _noise(enc.init(jax.random.PRNGKey(0), frames), 1)
    want = enc.apply(variables, frames)

    pq = quantize_sam_tree(variables["params"])
    dyn = SamImageEncoder(cfg=_with(cfg, quant_w8a8=True),
                          dtype=jnp.float32)
    out_dyn = dyn.apply({"params": pq}, frames)

    stats = collect_act_stats(dyn, pq, frames)
    # one stat per quant site: the fused norms (feeding qkv and mlp
    # lin1), the post-gelu lin2, the proj, the adapter's conv taps
    assert "absmax" in stats["blocks_0"]["norm1"]
    assert "absmax" in stats["blocks_0"]["norm2"]
    assert "absmax" in stats["blocks_0"]["mlp"]["lin2"]
    # the attention module owns the proj input's stat so the windowed
    # kernel can emit proj's int8 input directly (int8 epilogue)
    assert "proj_absmax" in stats["blocks_0"]["attn"]
    assert "absmax" in stats["adapters_0"]["conv3d"]
    # multi-batch merge is an elementwise max
    merged = merge_act_stats(stats, stats)
    ps = install_act_scales(pq, merged)
    assert float(np.asarray(ps["blocks_0"]["norm1"]["act_scale"])) > 0
    assert "act_scale" in ps["blocks_0"]["mlp"]["lin2"]
    assert "act_scale" in ps["adapters_0"]["conv3d"]
    assert "proj_act_scale" in ps["blocks_0"]["attn"]
    # LN-fused sites own the scale; their consumers don't re-quantize
    assert "act_scale" not in ps["blocks_0"]["attn"]["qkv"]
    assert "act_scale" not in ps["blocks_0"]["attn"]["proj"]
    assert "act_scale" not in ps["blocks_0"]["mlp"]["lin1"]

    st = SamImageEncoder(cfg=_with(cfg, quant_w8a8=True,
                                   quant_static_act=True),
                         dtype=jnp.float32)
    out_st = st.apply({"params": ps}, frames)
    rel_dyn, rel_st = _rel(out_dyn, want), _rel(out_st, want)
    assert rel_st < 0.15, (rel_st, rel_dyn)
    # per-tensor static is allowed to be somewhat worse than per-token
    # dynamic, but must stay the same order of magnitude
    assert rel_st < 5 * rel_dyn + 0.02, (rel_st, rel_dyn)


def test_clip_static_act_calibration(rng):
    cfg = ClipVisionConfig.tiny()
    tower = ClipVisionTower(cfg=cfg, dtype=jnp.float32, pool_thw=(2, 1, 2),
                            num_region_levels=1)
    frames = jnp.asarray(rng.normal(size=(1, 2, 28, 28, 3))
                         .astype(np.float32))
    variables = _noise(tower.init(jax.random.PRNGKey(0), frames), 2)
    want_tok, _ = tower.apply(variables, frames)

    pq = quantize_clip_tree(variables["params"])
    dyn = ClipVisionTower(cfg=_with(cfg, quant_w8a8=True),
                          dtype=jnp.float32, pool_thw=(2, 1, 2),
                          num_region_levels=1)
    out_dyn, _ = dyn.apply({"params": pq}, frames)

    stats = collect_act_stats(dyn, pq, frames)
    assert "absmax" in stats["layers_0"]["layer_norm1"]
    assert "absmax" in stats["layers_0"]["layer_norm2"]
    ps = install_act_scales(pq, stats)
    assert "act_scale" in ps["layers_0"]["layer_norm1"]
    # q/k/v/fc1 consume the fused-LN int8 output; no per-dense scale
    assert "act_scale" not in ps["layers_0"]["self_attn"]["q_proj"]
    assert "act_scale" not in ps["layers_0"]["fc1"]

    st = ClipVisionTower(cfg=_with(cfg, quant_w8a8=True,
                                   quant_static_act=True),
                         dtype=jnp.float32, pool_thw=(2, 1, 2),
                         num_region_levels=1)
    out_st, _ = st.apply({"params": ps}, frames)
    rel_dyn, rel_st = _rel(out_dyn, want_tok), _rel(out_st, want_tok)
    assert rel_st < 0.15, (rel_st, rel_dyn)
    assert rel_st < 5 * rel_dyn + 0.02, (rel_st, rel_dyn)


def test_static_quant_saturates_out_of_range(rng):
    """Values beyond the calibrated range clip to +-127 * scale — the
    documented saturation semantics of static scales."""
    from grove_tpu.models.layers import quant_act_static

    x = jnp.asarray([[1.2, -2.0, 300.0]], jnp.float32)
    xq, s = quant_act_static(x, jnp.asarray(1.0, jnp.float32))
    np.testing.assert_array_equal(np.asarray(xq), [[1, -2, 127]])
    assert float(s) == 1.0
