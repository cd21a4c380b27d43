"""8-virtual-device mesh: sharded train step executes and is finite."""

import importlib.util
import os
import sys

import jax
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


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


def test_fsdp_sp_step_matches_replicated():
    """FSDP param sharding + sequence-parallel activation constraints are
    placement-only: one train step must reproduce the replicated-step loss
    and updated params (fp32, CPU 8-device mesh)."""
    import numpy as np
    import jax.numpy as jnp

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import GroveModel, init_grove_params
    from grove_tpu.parallel.mesh import data_sharded, make_mesh
    from grove_tpu.parallel.sharding import (fsdp_shardings,
                                             sequence_parallel_sharding,
                                             shard_pytree)
    from grove_tpu.train.step import (OptimizerConfig, make_optimizer,
                                      make_train_step, partition_params,
                                      trainable_mask)

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32, batch=4)
    params = variables["params"]
    rng = np.random.default_rng(0)
    batch = mod._dummy_batch(cfg, 4, rng)

    opt_cfg = OptimizerConfig(total_steps=10, warmup_steps=2)
    optimizer = make_optimizer(params, opt_cfg)
    mask = trainable_mask(params, opt_cfg)

    def one_step(m, p, bat):
        trainable, frozen = partition_params(p, mask)
        opt_state = optimizer.init(trainable)
        step = jax.jit(make_train_step(m, optimizer))
        new_t, _, metrics = step(trainable, frozen, opt_state, bat)
        return float(metrics["loss"]), new_t

    loss_ref, t_ref = one_step(model, params, batch)

    mesh = make_mesh(data=4, model=2)
    sp_model = GroveModel(cfg, dtype=jnp.float32,
                          llm_act_sharding=sequence_parallel_sharding(mesh))
    p_shard = fsdp_shardings(params, mesh, min_size=1 << 8)
    params_s = shard_pytree(params, p_shard)
    batch_s = {k: jax.device_put(v, data_sharded(mesh, v.ndim))
               for k, v in batch.items()}
    loss_sh, t_sh = one_step(sp_model, params_s, batch_s)

    assert abs(loss_ref - loss_sh) < 1e-4 * max(1.0, abs(loss_ref))
    flat_ref = jax.tree.leaves(t_ref)
    flat_sh = jax.tree.leaves(t_sh)
    for a, b in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fsdp_shardings_shard_large_params():
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import init_grove_params
    from grove_tpu.parallel.mesh import make_mesh
    from grove_tpu.parallel.sharding import fsdp_shardings, path_str

    cfg = GroveConfig.tiny()
    _, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32, batch=1)
    params = variables["params"]
    mesh = make_mesh(data=4, model=2)
    sh = fsdp_shardings(params, mesh, min_size=1 << 8)

    import jax.tree_util as jtu
    flat = jtu.tree_flatten_with_path(sh)[0]
    specs = {path_str(p): s.spec for p, s in flat}
    # TP rule preserved AND data axis added on the other dim for a large
    # q_proj kernel
    qspec = specs["llama/layers_0/self_attn/q_proj/kernel"]
    assert "model" in qspec and "data" in qspec
    # embedding: sharded over at least one mesh axis (tiny config's vocab
    # is not model-divisible, so the fallback shards hidden over data)
    assert any(ax is not None for ax in specs["embed_tokens/embedding"])
    # small params (norms) stay replicated
    assert specs["llama/norm/weight"] == P()


def test_tp_sharded_decode_matches_unsharded():
    """Greedy decode with TP-sharded params (Megatron rules) over a
    2x4 (data, model) mesh reproduces the unsharded tokens — multi-chip
    serving for models that exceed one chip's HBM in bf16."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from grove_tpu.config import GroveConfig
    from grove_tpu.infer.generate import greedy_decode
    from grove_tpu.models.grove import init_grove_params
    from grove_tpu.parallel.mesh import make_mesh
    from grove_tpu.parallel.sharding import params_shardings, shard_pytree

    cfg = GroveConfig.tiny()
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32, batch=1)
    rng = np.random.default_rng(0)
    nv = cfg.num_video_tokens
    ids = rng.integers(3, 100, size=(2, nv + 6)).astype(np.int32)
    ids[:, 0] = cfg.tokens.bos
    ids[:, 2:2 + nv] = 0
    vs = np.full((2,), 2, np.int32)
    feats = rng.normal(size=(2, nv, cfg.llama.hidden_size)).astype(
        np.float32)
    kw = dict(max_new_tokens=5, eos_id=cfg.tokens.eos,
              cache_dtype=jnp.float32)
    g_ref, _ = greedy_decode(model, variables, jnp.asarray(ids),
                             jnp.asarray(feats), jnp.asarray(vs), **kw)

    mesh = make_mesh(data=2, model=4)
    params_s = shard_pytree(variables["params"],
                            params_shardings(variables["params"], mesh))
    sh_d = NamedSharding(mesh, P("data"))
    g_tp, _ = greedy_decode(model, {"params": params_s},
                            jax.device_put(jnp.asarray(ids), sh_d),
                            jax.device_put(jnp.asarray(feats), sh_d),
                            jax.device_put(jnp.asarray(vs), sh_d), **kw)
    assert np.asarray(g_ref).tolist() == np.asarray(g_tp).tolist()


def test_ground_act_sharding_matches_replicated():
    """`ground_act_sharding` is placement-only: GroveModel.ground on the
    dp4xtp2 mesh with TP-sharded params + the data-axis activation
    constraint reproduces the unconstrained single-placement output."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from grove_tpu.config import GroveConfig
    from grove_tpu.models.grove import GroveModel, init_grove_params
    from grove_tpu.parallel.mesh import make_mesh
    from grove_tpu.parallel.sharding import params_shardings, shard_pytree

    cfg = GroveConfig.tiny()
    b, t, p = 4, cfg.num_frames, cfg.max_phrases
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(2),
                                         dtype=jnp.float32, batch=b)
    rng = np.random.default_rng(3)
    seq = cfg.num_video_tokens + 8
    hidden = jnp.asarray(rng.normal(size=(b, seq, cfg.llama.hidden_size)),
                         jnp.float32)
    det = jnp.asarray(rng.integers(1, seq, size=(b, p)), jnp.int32)
    g = cfg.sam_enc.grid
    img = jnp.asarray(rng.normal(size=(b * t, g * g, cfg.sam_dec.embed_dim)),
                      jnp.float32)

    def run(m, vs, *args):
        return m.apply(vs, *args, method=GroveModel.ground)

    boxes_ref, obj_ref = jax.jit(run, static_argnums=0)(
        model, variables, hidden, det, img)

    mesh = make_mesh(data=4, model=2)
    model_s = GroveModel(cfg, dtype=jnp.float32,
                         ground_act_sharding=NamedSharding(mesh, P("data")))
    params_s = shard_pytree(variables["params"],
                            params_shardings(variables["params"], mesh))
    sh_d = NamedSharding(mesh, P("data"))
    boxes_s, obj_s = jax.jit(run, static_argnums=0)(
        model_s, {"params": params_s},
        jax.device_put(hidden, sh_d), jax.device_put(det, sh_d),
        jax.device_put(img, sh_d))
    np.testing.assert_allclose(np.asarray(boxes_s), np.asarray(boxes_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(obj_s), np.asarray(obj_ref),
                               rtol=2e-5, atol=2e-6)
