"""Guard the driver's exact calling convention for `__graft_entry__`.

Round-1 regression: `dryrun_multichip` only bootstrapped the virtual CPU
mesh from its `__main__` block, so the driver's `import __graft_entry__;
dryrun_multichip(8)` failed (`MULTICHIP_r01.json: ok=false`). This test
spawns a fresh interpreter with NO env preparation (XLA_FLAGS and
JAX_PLATFORMS stripped) and calls the function exactly as the driver does.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_driver_convention():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO_ROOT, env=env,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout, (
        proc.stdout[-2000:])
