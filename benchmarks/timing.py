"""THE honest-timing helper for every benchmark in this repo.

`jax.block_until_ready` is a NO-OP on the axon TPU runtime (an 8192^3
bf16 matmul "completed" in 0.02 ms; with a forced host transfer it
takes 7.2 ms = 152 TFLOP/s — benchmarks/README.md), so every
measurement must chain a device-side scalar accumulator through all
iterations and pull it to the host exactly once.  Two subtleties this
helper owns so callers can't get them wrong:

  * the warm-up call's accumulator is synced (compile excluded);
  * the measured function must fold its ENTIRE output into the
    accumulator — consuming only part of a gradient tree lets XLA
    dead-code-eliminate the rest of the backward (the r2 finding that
    under-reported the G phase by 42%); use `tree_acc` for pytrees.

Used by bench.py, step_profile.py, profile_transforms.py,
conv_experiments.py.
"""

import time

import jax
import jax.numpy as jnp

__all__ = ["honest_ms", "tree_acc"]


def tree_acc(tree):
    """Fold EVERY leaf of a pytree into a float32 scalar (DCE guard)."""
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree))


def honest_ms(fn, args, iters: int) -> float:
    """Mean wall-clock ms/iteration of `fn(*args, acc) -> acc`.

    `fn` must be jitted and return a scalar accumulator that depends on
    everything it computed (see module docstring / `tree_acc`).
    """
    acc = jnp.zeros((), jnp.float32)
    acc = fn(*args, acc)
    float(acc)  # compile + sync — warm-up excluded from timing
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(*args, acc)
    float(acc)  # ONE host transfer forces the whole chain
    return (time.perf_counter() - t0) / iters * 1e3
