"""Two-PROCESS distributed smoke test (VERDICT r3 next #6): spawns two
real processes with jax.distributed.initialize (local coordinator, CPU,
one device each), runs one tiny DP train step through
`shard_batch`'s make_array_from_process_local_data path, and checks the
loss against the same step computed single-process on the same global
batch.  This is the only test that actually crosses a process boundary
— everything else simulates multi-host at (index, count) pairs."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step():
    port = _free_port()
    env = dict(os.environ)
    # one CPU device per process; drop the parent's 8-device flag
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(port), str(i)],
                         env=env, cwd=ROOT, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    losses = []
    for out in outs:
        m = re.search(r"LOSS_G ([-\d.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    # both participants of the same global program agree exactly
    assert losses[0] == losses[1], losses

    # single-process same-global-batch reference
    import jax
    import jax.numpy as jnp

    from ficsr_tpu.train.config import TrainConfig
    from ficsr_tpu.train.state import create_train_state
    from ficsr_tpu.train.step import build_train_step

    cfg = TrainConfig(batchSize=2, sizeA=16, sizeB=32, d_layers=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    g = np.random.RandomState(7)
    full_a = g.randn(2, 1, 32, 32).astype(np.float32)
    full_b = g.randn(2, 1, 32, 32).astype(np.float32)
    step = build_train_step(cfg, donate=False)
    _, metrics = step(state, jnp.asarray(full_a), jnp.asarray(full_b),
                      1.3e-4)
    ref = float(metrics["loss_G"])
    assert abs(losses[0] - ref) < 1e-3 * (1 + abs(ref)), (losses, ref)
