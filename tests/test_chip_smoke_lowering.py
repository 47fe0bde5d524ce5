"""The on-chip smoke probe must lower against the CURRENT kernel API.

VERDICT r3 weak #2: ``experiments/chip_smoke.py`` rotted against the
packed ``geo_t`` layout and failed for non-chip reasons, nearly
misleading a chip health check.  This runs the exact probe script on the
CPU backend (interpret-mode Pallas) at shrunken shapes, so API drift is
caught in CI instead of at 2 a.m. on a sick chip.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("mode", ["fwd", "bwd"])
def test_chip_smoke_lowers_on_cpu(mode):
    env = dict(os.environ, SMOKE_M="128", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "experiments", "chip_smoke.py"),
         mode],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok" in proc.stdout, proc.stdout
