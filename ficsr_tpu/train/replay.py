"""Functional replay buffer (reference `utils.py:31-51`).

The reference's ReplayBuffer shuttles fakes through a Python list on
every step — a host round-trip per image.  Here the 50-slot history is
a device-resident array inside the train state, and push_and_pop is a
jittable `lax.scan` over the batch with explicit PRNG, preserving the
reference's per-element semantics exactly:

  * while not full: store the element, return the element
  * when full: with p=0.5 return a uniformly random stored element and
    replace it with the incoming one, else return the incoming one
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

__all__ = ["ReplayBufferState", "replay_init", "push_and_pop"]


@flax.struct.dataclass
class ReplayBufferState:
    data: jnp.ndarray   # (max_size, C, H, W)
    size: jnp.ndarray   # scalar int32, number of valid slots


def replay_init(max_size: int, shape: Tuple[int, ...],
                dtype=jnp.float32) -> ReplayBufferState:
    return ReplayBufferState(
        data=jnp.zeros((max_size,) + tuple(shape), dtype),
        size=jnp.zeros((), jnp.int32),
    )


def push_and_pop(state: ReplayBufferState, batch: jnp.ndarray,
                 rng: jax.Array) -> Tuple[ReplayBufferState, jnp.ndarray]:
    """Push a (N,C,H,W) batch of fakes; return the (N,C,H,W) batch to
    train the discriminator on."""
    max_size = state.data.shape[0]

    def step(carry, inp):
        data, size = carry
        img, key = inp
        k_coin, k_idx = jax.random.split(key)
        not_full = size < max_size
        coin = jax.random.uniform(k_coin) > 0.5
        rand_idx = jax.random.randint(k_idx, (), 0, max_size)

        write = jnp.logical_or(not_full, coin)
        slot = jnp.where(not_full, size, rand_idx)
        old = data[slot]
        new_row = jnp.where(write, img, old)
        data = jax.lax.dynamic_update_index_in_dim(data, new_row, slot, 0)

        swap = jnp.logical_and(jnp.logical_not(not_full), coin)
        out = jnp.where(swap, old, img)
        size = jnp.where(not_full, size + 1, size)
        return (data, size), out

    keys = jax.random.split(rng, batch.shape[0])
    (data, size), outs = jax.lax.scan(
        step, (state.data, state.size), (batch, keys))
    return ReplayBufferState(data=data, size=size), outs
