"""Cached jitted apply wrappers.

On the axon TPU relay, eager (non-jit) execution dispatches one primitive at
a time and is pathologically slow (see .claude/skills/verify/SKILL.md), so
every model.apply on a hot path must go through jit. jax.jit caches on
callable identity, so wrappers are memoized per (model, method) — flax
modules are frozen dataclasses and hash by config.
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=128)
def jitted_method(model, method_name: str):
    method = getattr(type(model), method_name)

    @jax.jit
    def run(variables, *args):
        return model.apply(variables, *args, method=method)

    return run


def apply_jit(model, variables, *args, method: str):
    return jitted_method(model, method)(variables, *args)
