"""CLIP-L/336 tower piece probe at full-scale shapes (32 images, S=577).

The tower is ~20.7 TF at batch 4 x 8 frames: 24 encoder layers (12.2 TF)
plus EIGHT gated Conv3d adapters (8.35 TF — 40% of the stage's FLOPs, on
an awkward (b, 8, 16, 36, 1024) grid). This times one encoder layer, the
attention alone, and the adapter conv in both formulations.

Slope-timed finding (2026-08-17): XLA attention at (32, 577, 16, 64) is
0.89 ms = 49 TF/s — near the K=64 MXU ceiling; a custom grouped Pallas
kernel for this shape measured 1.7 ms and was dropped. The earlier
"~7-9 ms" reading was the ~27 ms relay launch overhead divided by
iters=5 (see _timing.py docstring).

Run: python benchmarks/clip_probe.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _timing import timed_loop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", default=32, type=int)
    p.add_argument("--iters", default=5, type=int)
    args = p.parse_args()

    from grove_tpu.config import ClipVisionConfig
    from grove_tpu.models.clip import ClipAttention, ClipEncoderLayer

    cfg = ClipVisionConfig()
    bt = args.images
    s = cfg.num_patches + 1
    c = cfg.hidden_size
    rng = jax.random.PRNGKey(0)
    report = {"images": bt, "seq": s, "dim": c}

    def timeit(name, fn, *fargs):
        try:
            secs = timed_loop(fn, *fargs, iters=args.iters)
        except Exception as e:                            # noqa: BLE001
            report[name] = f"FAIL: {type(e).__name__}"
            print(f"  {name}: FAILED ({str(e)[:100]})", flush=True)
            return None
        report[name] = round(secs * 1e3, 2)
        print(f"  {name}: {secs*1e3:.2f} ms", flush=True)
        return secs

    x = jax.jit(lambda: jnp.zeros((bt, s, c), jnp.bfloat16))()
    layer = ClipEncoderLayer(cfg, dtype=jnp.bfloat16)
    lvars = jax.jit(layer.init)(rng, x)
    timeit("encoder_layer_ms", lambda v, a: layer.apply(v, a), lvars, x)

    attn = ClipAttention(cfg, dtype=jnp.bfloat16)
    avars = jax.jit(attn.init)(rng, x)
    timeit("attention_ms", lambda v, a: attn.apply(v, a), avars, x)

    # adapter at the CLIP grid (b, t, 16, 36, 1024)
    import flax.linen as nn
    from grove_tpu.models.layers import _Conv3dShifts
    b = bt // cfg.num_frames
    grid = jax.jit(lambda: jnp.zeros(
        (b, cfg.num_frames, cfg.adapter_h,
         cfg.num_patches // cfg.adapter_h, c), jnp.bfloat16))()
    conv = nn.Conv(c, (3, 3, 3), padding="SAME", dtype=jnp.bfloat16)
    cvars = jax.jit(conv.init)(rng, grid)
    timeit("adapter_conv3d_ms", lambda v, a: conv.apply(v, a), cvars, grid)
    sh = _Conv3dShifts(c, (3, 3, 3), dtype=jnp.bfloat16)
    svars = jax.jit(sh.init)(rng, grid)
    timeit("adapter_shifts_ms", lambda v, a: sh.apply(v, a), svars, grid)

    est = (report["encoder_layer_ms"] * cfg.num_layers
           + min(report.get("adapter_conv3d_ms", 1e9),
                 report.get("adapter_shifts_ms", 1e9)) * 8)
    report["estimated_total_ms"] = round(est, 1)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
