"""Driver-gate regression: dryrun_multichip must materialize its own
virtual CPU mesh in a FRESH process (no conftest help), exactly like the
driver runs it.  Round-1 failed this gate on an init-ordering bug
(device query before the platform override) — keep it pinned green.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    # Mimic the driver: env may carry the flag or not; the function must
    # cope either way.  Strip any test-session XLA_FLAGS so the function
    # has to install its own.
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed\nstdout: {proc.stdout[-2000:]}"
        f"\nstderr: {proc.stderr[-2000:]}")
    assert "dryrun_multichip ok" in proc.stdout
