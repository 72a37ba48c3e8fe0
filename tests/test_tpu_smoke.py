"""Compiled-Pallas smoke: run scripts/tpu_smoke.py on the real TPU backend.

The rest of the suite pins Pallas kernels in interpret mode on CPU
(conftest.py forces the CPU backend), which never exercises the Mosaic
lowering.  This test spawns the smoke script in a subprocess WITHOUT the
forced-CPU env so it sees whatever real accelerator is attached; it skips
cleanly (script exit code 2) on machines with no TPU.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "tpu_smoke.py")


@pytest.mark.slow
def test_pallas_smoke_on_real_backend():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # let the platform plugin pick the TPU
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run([sys.executable, SCRIPT], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=1200)
    if proc.returncode == 2:
        pytest.skip("no TPU backend attached")
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "SMOKE_PASS" in proc.stdout
