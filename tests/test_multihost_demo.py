"""Multi-host streaming training: 2 real jax.distributed CPU processes.

The pod-scale analogue of `train.py:452-463` (DistributedSampler sharding +
DDP all-reduce): per-host manifest shards -> production loader -> ONE SPMD
train step over the global mesh. The parent asserts disjoint shards and an
identical (all-reduced) global loss on every host at every step.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_streaming_training(tmp_path):
    # fresh interpreters: the workers must form their own cluster, so the
    # parent also runs outside this pytest process's jax config
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    code = ("from grove_tpu.tools.multihost_demo import main; "
            f"main(['--num_processes', '2', '--steps', '2', "
            f"'--workdir', {str(tmp_path)!r}])")
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO_ROOT,
                          env=env, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "multihost demo OK" in proc.stdout
