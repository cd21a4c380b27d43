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
