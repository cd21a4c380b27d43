"""8-virtual-device mesh: sharded train step executes and is finite."""

import importlib.util
import os
import sys

import jax
import pytest


def test_dryrun_multichip_8():
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_dryrun_multichip_2():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(2)


def test_sharded_batch_decode_matches_unsharded():
    """Greedy decode with the batch sharded over the data axis of an
    8-device mesh reproduces the single-device result (inference DP,
    the reference's DDP-sharded inference `infer_iground.py:538-551`)."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from grove_tpu.config import GroveConfig
    from grove_tpu.infer.generate import greedy_decode
    from grove_tpu.models.grove import init_grove_params

    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32, batch=1)
    rng = np.random.default_rng(0)
    b = 8
    nv = cfg.num_video_tokens
    ls = nv + 6
    ids = rng.integers(3, 100, size=(b, ls)).astype(np.int32)
    ids[:, 0] = cfg.tokens.bos
    ids[:, 2:2 + nv] = 0
    vs = np.full((b,), 2, np.int32)
    feats = rng.normal(size=(b, nv, cfg.llama.hidden_size)).astype(np.float32)

    g_ref, _ = greedy_decode(model, variables, jnp.asarray(ids),
                             jnp.asarray(feats), jnp.asarray(vs),
                             max_new_tokens=4, eos_id=cfg.tokens.eos,
                             cache_dtype=jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    ids_s = jax.device_put(jnp.asarray(ids), sh)
    feats_s = jax.device_put(jnp.asarray(feats), sh)
    vs_s = jax.device_put(jnp.asarray(vs), sh)
    vars_s = jax.device_put(variables, rep)
    g_sh, _ = greedy_decode(model, vars_s, ids_s, feats_s, vs_s,
                            max_new_tokens=4, eos_id=cfg.tokens.eos,
                            cache_dtype=jnp.float32)
    assert np.asarray(g_sh).tolist() == np.asarray(g_ref).tolist()
