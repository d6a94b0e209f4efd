"""Worker for tests/test_multiprocess.py: one of two real processes in
a jax.distributed CPU cluster, running one DP train step on a 2-device
global mesh (1 local device per process).

Usage: python tests/_mp_worker.py PORT PROCESS_ID
Prints "LOSS_G <value>" on success (parsed by the parent test).
"""

import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])

    import jax
    # the axon plugin force-sets jax_platforms via jax.config, so the
    # env var alone is not enough (tests/conftest.py has the same note)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid,
        local_device_ids=[0],
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.devices()
    assert len(jax.local_devices()) == 1

    import numpy as np
    import jax.numpy as jnp  # noqa: F401

    from ficsr_tpu.parallel.mesh import (
        make_mesh, maybe_init_distributed, replicate, shard_batch,
        shard_train_step)
    from ficsr_tpu.train.config import TrainConfig
    from ficsr_tpu.train.state import create_train_state
    from ficsr_tpu.train.step import build_train_step

    # already initialized explicitly above; must be a no-op (no env vars)
    assert maybe_init_distributed() is False

    cfg = TrainConfig(batchSize=2, sizeA=16, sizeB=32, d_layers=2)
    mesh = make_mesh()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = replicate(mesh, state)
    step = shard_train_step(build_train_step(cfg, jit=False), mesh)

    # the global batch every participant agrees on; each host feeds
    # ONLY its own row through make_array_from_process_local_data
    # (mesh.shard_batch's process_count>1 path)
    g = np.random.RandomState(7)
    full_a = g.randn(2, 1, 32, 32).astype(np.float32)
    full_b = g.randn(2, 1, 32, 32).astype(np.float32)
    real_a = shard_batch(mesh, full_a[pid:pid + 1])
    real_b = shard_batch(mesh, full_b[pid:pid + 1])
    assert real_a.shape == (2, 1, 32, 32), real_a.shape  # global shape

    state, metrics = step(state, real_a, real_b, 1.3e-4)
    loss = float(metrics["loss_G"])
    print(f"LOSS_G {loss:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
