"""Shared timing harness for the axon-relay TPU environment.

Rules (verified round 1-2): per-launch overhead ~30 ms and eager dispatch
is pathological, so iteration loops must live INSIDE one jit; completion
must be forced by fetching a scalar (block_until_ready under-reports
through the relay); and the loop body must be chained through the carry —
a body that does not depend on the loop index/carry is loop-invariant, and
XLA hoists it out and runs it ONCE (observed: stage TF/s above the chip
peak with the naive pattern).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(x)


def _float_ok(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def timed_loop(fn, *args, iters=3, perturb=None):
    """secs/iter; `perturb` = arg index whose first float leaf gets the
    carry folded in (default: last arg with a float leaf)."""
    if perturb is None:
        perturb = max(i for i, a in enumerate(args)
                      if any(_float_ok(l) for l in jax.tree.leaves(a)))

    @jax.jit
    def loop(*a):
        def body(i, acc):
            a2 = list(a)
            lv, td = jax.tree_util.tree_flatten(a2[perturb])
            j = next(k for k, x in enumerate(lv) if _float_ok(x))
            x = lv[j]
            eps = (acc * 1e-30).astype(x.dtype)
            lv[j] = x.reshape(-1).at[0].add(eps).reshape(x.shape)
            a2[perturb] = jax.tree_util.tree_unflatten(td, lv)
            out = fn(*a2)
            leaf = next(l for l in jax.tree.leaves(out)
                        if hasattr(l, "reshape"))
            return acc + leaf.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    fetch(loop(*args))                    # compile + warm
    t0 = time.time()
    fetch(loop(*args))
    return (time.time() - t0) / iters
