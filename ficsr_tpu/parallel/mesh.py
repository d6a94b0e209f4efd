"""Device mesh + data-parallel sharding (SURVEY §5: the TPU-native
communication layer; the reference has no distributed story at all).

The model is small (G ~11M params, D ~2.8M) so parameters replicate and
the batch shards over a 1-D 'data' mesh — pure DP over ICI covers every
BASELINE config (config 5: batch 128 on v5e-16).  Gradients synchronize
through the psum XLA inserts automatically when a jitted program
consumes sharded inputs into replicated outputs; no hand-written
collectives needed at this model scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "shard_train_step",
           "state_shardings"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Shard leading (batch) dimension across the mesh.

    Single-host: a plain device_put scatter.  Multi-host (pods): `x` is
    this host's `global_batch/process_count` rows (see
    data/prefetch.prefetch_batches' `shard=`), assembled into one global
    jax.Array whose batch axis spans the whole mesh — per-host data
    rides DCN only to local HBM; gradient psum rides ICI.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    def put(arr):
        global_shape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(arr), global_shape)
    return jax.tree.map(put, x)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def state_shardings(mesh: Mesh, state_template, replay_sharded: bool =
                    False, axis: str = "data"):
    """TrainState-shaped pytree of shardings: everything replicated,
    except — when `replay_sharded` (TrainConfig.replay_shards ==
    mesh size) — the replay buffers' leading shard axis rides the data
    axis, so each DP shard's buffer lives only on its own device."""
    rep = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: rep, state_template)
    if replay_sharded:
        dp = NamedSharding(mesh, P(axis))
        buf = jax.tree.map(lambda _: dp, state_template.buf_a)
        shardings = shardings.replace(buf_a=buf, buf_b=buf)
    return shardings


def shard_train_step(train_step, mesh: Mesh, axis: str = "data",
                     state_template=None, replay_sharded: bool = False):
    """Wrap a jitted train step with explicit DP shardings: state
    replicated, batch sharded on dim 0, scalars replicated.

    `replay_sharded` (requires `state_template`, a concrete or abstract
    TrainState built with TrainConfig.replay_shards == mesh size) keeps
    the replay buffers sharded over the data axis on both sides of the
    step, so the per-shard updates (replay.push_and_pop_sharded) stay
    device-local instead of all-gathering fakes into a replicated
    buffer."""
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(axis))
    if replay_sharded:
        assert state_template is not None, \
            "replay_sharded needs a state_template"
        st = state_shardings(mesh, state_template, True, axis)
    else:
        st = rep

    return jax.jit(
        train_step,
        in_shardings=(st, dp, dp, rep),
        out_shardings=(st, rep),
        donate_argnums=(0,),
    )


def maybe_init_distributed() -> bool:
    """Multi-host initialization (SURVEY §5): call once at process start
    on multi-host pods. No-op unless coordinator env vars are present
    (JAX_COORDINATOR_ADDRESS or COORDINATOR_ADDRESS, as set by most TPU
    pod launchers)."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or \
        os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return False
    jax.distributed.initialize()
    return True
