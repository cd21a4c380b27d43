"""XLA vs Pallas window partition/unpartition at SAM-H shapes.

The b4 SAM profile shows ~58 ms copies + ~22 ms reshapes + ~5 ms pads
(mostly the per-block window round trips). This measures the XLA
helpers against the one-pass Pallas kernels (ops/window_ops.py) at the
production shapes: partition of the int8 quantized grid, unpartition of
the bf16 attention output.

Run: python benchmarks/window_probe.py [--frames 32]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from _timing import timed_loop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", default=32, type=int)
    p.add_argument("--iters", default=8, type=int)
    args = p.parse_args()

    from grove_tpu.models.sam_encoder import (window_partition,
                                              window_unpartition)
    from grove_tpu.ops.window_ops import (window_partition_fused,
                                          window_unpartition_fused)

    bt, g, c, win = args.frames, 32, 1280, 14
    gh = -(-g // win)
    nw = bt * gh * gh
    rng = np.random.default_rng(0)

    x8 = jnp.asarray(rng.integers(-127, 128, size=(bt, g, g, c)), jnp.int8)
    xb = jnp.asarray(rng.normal(size=(bt, g, g, c)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(nw, win, win, c)), jnp.bfloat16)

    report = {"frames": bt, "grid": g, "embed_dim": c, "window": win}

    def t(name, fn, *fargs):
        ms = timed_loop(fn, *fargs, iters=args.iters) * 1e3
        report[name] = round(ms, 3)
        print(f"  {name}: {ms:.3f} ms", flush=True)

    t("xla_partition_int8", lambda a: window_partition(a, win)[0], x8)
    t("pallas_partition_int8",
      lambda a: window_partition_fused(a, win), x8)
    t("xla_partition_bf16", lambda a: window_partition(a, win)[0], xb)
    t("pallas_partition_bf16",
      lambda a: window_partition_fused(a, win), xb)
    t("xla_unpartition_bf16",
      lambda a: window_unpartition(a, win, (gh * win, gh * win), (g, g)),
      wb)
    t("pallas_unpartition_bf16",
      lambda a: window_unpartition_fused(a, win, (g, g)), wb)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
