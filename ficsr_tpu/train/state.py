"""Train state container + initialization.

One pytree holds everything the jitted step mutates: both generators,
both discriminators, both AdamW optimizer states, both replay buffers,
BN running stats, and the PRNG key — so the whole step is a single
donated-buffer XLA program (contrast: the reference's step crosses the
Python/device boundary dozens of times, SURVEY §3.1).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ficsr_tpu.models import FSDiscriminator, NetworkA2B, NetworkB2A
from ficsr_tpu.train.config import TrainConfig
from ficsr_tpu.train.replay import ReplayBufferState, replay_init

__all__ = ["TrainState", "create_train_state", "make_optimizer", "MODELS",
           "models_for"]


@functools.lru_cache(maxsize=None)
def models_for(d_layers: int = 5):
    """Module singletons (stateless; parameters live in the state pytree)."""
    return {
        "a2b": NetworkA2B(),
        "b2a": NetworkB2A(),
        "da": FSDiscriminator(cs="sum", sum_band="ll", n_layers=d_layers),
        "db": FSDiscriminator(cs="cat", sum_band="hh", n_layers=d_layers),
    }


MODELS = models_for(5)


@flax.struct.dataclass
class TrainState:
    g_params: Any
    g_stats: Any
    d_params: Any
    d_stats: Any
    g_opt: optax.OptState
    d_opt: optax.OptState
    buf_a: ReplayBufferState
    buf_b: ReplayBufferState
    rng: jax.Array
    step: jnp.ndarray


def make_optimizer() -> optax.GradientTransformation:
    """AdamW matching torch defaults used by the reference
    (train.py:102-103): betas (0.9, 0.999), eps 1e-8, weight_decay 1e-2
    applied to every parameter (torch decays BN affine params too).
    The LR is injected per-step so per-epoch schedules never recompile."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2
    )


def create_train_state(config: TrainConfig, rng: jax.Array) -> TrainState:
    size = config.sizeB  # both domains train at sizeB^2 (=sizeA*2)
    dummy = jnp.zeros((1, config.input_nc, size, size), jnp.float32)
    models = models_for(config.d_layers)

    k = jax.random.split(rng, 6)
    va = models["a2b"].init(k[0], dummy, dummy, train=False)
    vb = models["b2a"].init(k[1], dummy, dummy, train=False)
    vda = models["da"].init(k[2], dummy, train=False)
    vdb = models["db"].init(k[3], dummy, train=False)

    g_params = {"a2b": va["params"], "b2a": vb["params"]}
    g_stats = {"a2b": va["batch_stats"], "b2a": vb["batch_stats"]}
    d_params = {"da": vda["params"], "db": vdb["params"]}
    d_stats = {"da": vda["batch_stats"], "db": vdb["batch_stats"]}

    tx = make_optimizer()
    img_shape = (config.input_nc, size, size)
    return TrainState(
        g_params=g_params,
        g_stats=g_stats,
        d_params=d_params,
        d_stats=d_stats,
        g_opt=tx.init(g_params),
        d_opt=tx.init(d_params),
        buf_a=replay_init(config.replay_buffer_size, img_shape,
                          shards=config.replay_shards),
        buf_b=replay_init(config.replay_buffer_size, img_shape,
                          shards=config.replay_shards),
        rng=k[4],
        step=jnp.zeros((), jnp.int32),
    )
