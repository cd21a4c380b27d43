"""Shared timing harness for the axon-relay TPU environment.

Rules (verified rounds 1-2, each by measurement):
- per-launch overhead is ~27 ms and eager dispatch is pathological, so
  iteration loops must live INSIDE one jit;
- completion must be forced by fetching a scalar (block_until_ready
  under-reports through the relay);
- the loop body must be chained through the carry — a body that does not
  depend on the loop index/carry is loop-invariant, and XLA hoists it out
  and runs it ONCE (observed: stage TF/s above the chip peak);
- the launch overhead does NOT amortize at small iteration counts: at
  iters=5 it adds ~5.4 ms/iter to every number (observed: a 0.87 ms
  4096^3 matmul "measuring" 6.2 ms). `timed_loop` therefore times the
  SAME compiled loop at two iteration counts and returns the slope,
  which cancels every per-launch fixed cost. The loop bound is a traced
  scalar so both points share one executable.
- scalar chaining must use multi-index reads/updates, not reshape(-1):
  a flat reshape forces a full re-tiling copy (~6 ms on 38 MB, measured).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(x)


def _float_ok(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def timed_loop(fn, *args, iters=3, perturb=None, extra=20):
    """secs/iter by two-point slope: (t[iters+extra] - t[iters]) / extra.

    `perturb` = arg index whose first float leaf gets the carry folded in
    (default: last arg with a float leaf). `extra` sets the slope
    baseline; larger = less launch-jitter sensitivity, more wall time.
    """
    if perturb is None:
        perturb = max(i for i, a in enumerate(args)
                      if any(_float_ok(l) for l in jax.tree.leaves(a)))

    @jax.jit
    def loop(n, *a):
        def body(i, acc):
            a2 = list(a)
            lv, td = jax.tree_util.tree_flatten(a2[perturb])
            j = next(k for k, x in enumerate(lv) if _float_ok(x))
            x = lv[j]
            eps = (acc * 1e-30).astype(x.dtype)
            lv[j] = x.at[(0,) * x.ndim].add(eps)
            a2[perturb] = jax.tree_util.tree_unflatten(td, lv)
            out = fn(*a2)
            leaf = next(l for l in jax.tree.leaves(out)
                        if hasattr(l, "reshape"))
            return acc + leaf[(0,) * leaf.ndim].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, 0.0,
                                 unroll=False)

    lo, hi = iters, iters + extra
    fetch(loop(hi, *args))                # compile + warm
    t0 = time.time()
    fetch(loop(lo, *args))
    t_lo = time.time() - t0
    t0 = time.time()
    fetch(loop(hi, *args))
    t_hi = time.time() - t0
    slope = (t_hi - t_lo) / extra
    if slope <= 0:                        # launch jitter swamped the signal
        return t_hi / hi
    return slope
