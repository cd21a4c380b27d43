"""Shared timing harness for the axon-relay TPU environment.

Every rule below was learned by catching a wrong number (rounds 1-2):

- Per-launch overhead is ~27 ms and eager dispatch is pathological, so
  iteration loops must live INSIDE one jit, and the launch overhead does
  NOT amortize at small iteration counts (a 0.87 ms 4096^3 matmul "read"
  6.2 ms at iters=5). `timed_loop` times the SAME compiled loop (traced
  iteration bound, one executable) at two counts and returns the slope,
  cancelling every per-launch fixed cost.
- Completion must be forced by fetching a scalar; block_until_ready
  under-reports through the relay.
- The body must depend on the carry in EVERY input, or XLA hoists the
  loop-invariant subgraphs and runs them once (observed: stage TF/s
  above chip peak; observed subtler: perturbing only `v` of an attention
  probe lets QK^T+softmax hoist, halving apparent cost). We fold the
  carry into the smallest float leaf of EVERY argument — the one-element
  update copies that leaf per iteration, so the smallest leaf keeps the
  copy negligible while norm-scale-sized leaves still gate all compute.
- The carry must consume EVERY output leaf, or XLA dead-code-eliminates
  what the fetched scalar doesn't need — including pushing the slice
  through batch dims of dot_general (observed: an 8-batch 4096^3 einsum
  "ran" at 1186 TF/s because only batch element 0 was computed). Full
  per-leaf reductions (fused into producers by XLA) keep all work live.
- Scalar chaining must use multi-index reads/updates, not reshape(-1):
  a flat reshape forces a full re-tiling copy (~6 ms on 38 MB, measured).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache: verified to work through the axon relay
# (18 s -> 1.5 s on a recompiled jit). Shared by every benchmark that
# imports this module, so repeated full-scale runs skip the multi-minute
# SAM-H/LLM compiles. Caches executables only — timing is unaffected.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch(x):
    return np.asarray(x)


def _float_ok(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def _numeric(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.number)


def timed_loop(fn, *args, iters=3, perturb=None, extra=20, repeats=1):
    """secs/iter by two-point slope: (t[iters+extra] - t[iters]) / extra.

    `perturb`: None = smallest float leaf of every arg (default; defeats
    per-input hoisting); an int = that arg only (legacy single-arg mode,
    for callers that need other args bitwise-untouched).
    `repeats`: measure each endpoint this many times and slope the MIN
    of each — the relay's load varies run-to-run (observed 3x swings on
    sub-ms ops). Noise only inflates a wall-clock reading, so min(t_lo)
    and min(t_hi) each converge on true device time + the fixed launch
    floor, and their difference cancels the floor. (Taking min over
    per-pair SLOPES instead is wrong: a noise spike in one pair's t_lo
    makes that pair's slope spuriously small — observed 3992 GB/s
    "bandwidth".) Sub-ms ops should also raise `extra` so the slope
    window dwarfs launch jitter.
    """
    if perturb is None:
        pert_args = [i for i, a in enumerate(args)
                     if any(_float_ok(l) for l in jax.tree.leaves(a))]
    else:
        pert_args = [perturb]

    @jax.jit
    def loop(n, *a):
        def body(i, acc):
            a2 = list(a)
            eps32 = acc * 1e-30
            for pi in pert_args:
                lv, td = jax.tree_util.tree_flatten(a2[pi])
                fl = [k for k, x in enumerate(lv) if _float_ok(x)]
                j = min(fl, key=lambda k: lv[k].size)
                x = lv[j]
                lv[j] = x.at[(0,) * x.ndim].add(eps32.astype(x.dtype))
                a2[pi] = jax.tree_util.tree_unflatten(td, lv)
            out = fn(*a2)
            tot = eps32 * 0.0
            for leaf in jax.tree.leaves(out):
                if _numeric(leaf):
                    tot = tot + jnp.sum(leaf, dtype=jnp.float32)
            # masked/NEG_INF outputs can sum to inf; keep the carry finite
            return acc + jnp.nan_to_num(tot * 1e-12, posinf=1.0,
                                        neginf=-1.0)
        return jax.lax.fori_loop(0, n, body, 0.0)

    lo, hi = iters, iters + extra
    fetch(loop(hi, *args))                # compile + warm
    t_lo = min_t_hi = None
    for _ in range(max(1, repeats)):
        t0 = time.time()
        fetch(loop(lo, *args))
        t = time.time() - t0
        t_lo = t if t_lo is None else min(t_lo, t)
        t0 = time.time()
        fetch(loop(hi, *args))
        t = time.time() - t0
        min_t_hi = t if min_t_hi is None else min(min_t_hi, t)
    slope = (min_t_hi - t_lo) / extra
    if slope <= 0:                        # launch jitter swamped the signal
        return min_t_hi / hi
    return slope
