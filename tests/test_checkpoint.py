"""Checkpoint converter round-trip: flax -> torch namespace -> flax."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

from grove_tpu.config import GroveConfig
from grove_tpu.checkpoint.torch_convert import (convert_state_dict,
                                                merge_into,
                                                resize_abs_pos,
                                                resize_rel_pos,
                                                to_torch_state_dict,
                                                _flatten)
from grove_tpu.models.grove import init_grove_params


@pytest.fixture(scope="module")
def tiny_params():
    cfg = GroveConfig.tiny()
    _, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
    return cfg, jax.tree.map(np.asarray, variables["params"])


def test_round_trip(tiny_params):
    cfg, params = tiny_params
    sd = to_torch_state_dict(params, cfg)
    assert len(sd) > 50
    converted, report = convert_state_dict(sd, cfg)
    assert not report["unmapped"], report["unmapped"][:10]

    flat_orig = _flatten(params)
    flat_conv = _flatten(converted)
    missing = set(flat_conv) - set(flat_orig)
    assert not missing, sorted(missing)[:10]
    for k, v in flat_conv.items():
        np.testing.assert_allclose(v, flat_orig[k], atol=1e-6, err_msg=k)


def test_round_trip_covers_most_params(tiny_params):
    cfg, params = tiny_params
    sd = to_torch_state_dict(params, cfg)
    converted, _ = convert_state_dict(sd, cfg)
    flat_orig = _flatten(params)
    flat_conv = _flatten(converted)
    uncovered = set(flat_orig) - set(flat_conv)
    # everything should round-trip (no orphan flax params)
    assert not uncovered, sorted(uncovered)[:20]


def test_merge_into_checks_shapes(tiny_params):
    cfg, params = tiny_params
    sd = to_torch_state_dict(params, cfg)
    converted, _ = convert_state_dict(sd, cfg)
    merged, missing, mismatched = merge_into(params, converted)
    assert not missing and not mismatched
    flat_m = _flatten(merged)
    flat_o = _flatten(params)
    for k in flat_o:
        np.testing.assert_allclose(flat_m[k], flat_o[k], atol=1e-6)


def test_resize_positional_embeddings():
    pos = np.random.default_rng(0).normal(size=(1, 64, 64, 8)).astype(np.float32)
    out = resize_abs_pos(pos, 32)
    assert out.shape == (32, 32, 8)
    rel = np.random.default_rng(0).normal(size=(127, 8)).astype(np.float32)
    out = resize_rel_pos(rel, 63)
    assert out.shape == (63, 8)
    # identity when already the right size
    same = resize_rel_pos(rel, 127)
    np.testing.assert_array_equal(same, rel)


def test_save_pretrained_roundtrip(tmp_path):
    """HF-layout dir (config.json + flax_model.msgpack) round-trips through
    the public facade with identical params and config."""
    import jax.numpy as jnp
    import numpy as np
    import jax
    from grove_tpu.api.model import GroveForCausalLM
    from grove_tpu.config import GroveConfig

    m = GroveForCausalLM.from_pretrained(model_size="tiny",
                                         dtype=jnp.float32, seed=3)
    d = str(tmp_path / "hub_model")
    m.save_pretrained(d)
    import os
    assert os.path.exists(os.path.join(d, "config.json"))
    assert os.path.exists(os.path.join(d, "flax_model.msgpack"))

    m2 = GroveForCausalLM.from_pretrained(d, dtype=jnp.float32)
    assert m2.cfg == m.cfg
    leaves1 = jax.tree_util.tree_leaves(m.variables["params"])
    leaves2 = jax.tree_util.tree_leaves(m2.variables["params"])
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
