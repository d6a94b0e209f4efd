"""On-device preprocessing (reference transform pipelines,
`train.py:129-160`, BASELINE config 5: on-device patch extraction /
augmentation).

Train-time recipe:
  A (6mm LR): uint8 -> [0,1] -> random crop sizeA^2 -> bicubic resize
              x2 -> normalize (x-0.5)/0.5            (train.py:129-134)
  B (3mm HR): uint8 -> [0,1] -> normalize -> random crop sizeB^2
                                                      (train.py:136-140)
Eval:
  center crop 256 -> normalize                        (train.py:151-160)

The host only stacks raw uint8 images; crops, the bicubic x2 upscale,
and normalization are one jitted program, batched, with explicit PRNG.
Random crop uses `lax.dynamic_slice` with per-sample offsets via vmap —
static output shapes, TPU-friendly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "to_unit",
    "normalize",
    "random_crop",
    "center_crop",
    "bicubic_resize",
    "preprocess_train_a",
    "preprocess_train_b",
    "preprocess_eval",
]


def to_unit(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 -> float32 in [0,1] (torchvision ToTensor)."""
    return img_u8.astype(jnp.float32) / 255.0


def normalize(x: jnp.ndarray, mean: float = 0.5, std: float = 0.5) -> jnp.ndarray:
    return (x - mean) / std


def random_crop(imgs: jnp.ndarray, size: int, rng: jax.Array) -> jnp.ndarray:
    """Per-sample random crop. imgs: (N, H, W) -> (N, size, size)."""
    n, h, w = imgs.shape
    k1, k2 = jax.random.split(rng)
    tops = jax.random.randint(k1, (n,), 0, h - size + 1)
    lefts = jax.random.randint(k2, (n,), 0, w - size + 1)

    def crop_one(img, top, left):
        return jax.lax.dynamic_slice(img, (top, left), (size, size))

    return jax.vmap(crop_one)(imgs, tops, lefts)


def paired_random_crop(a: jnp.ndarray, b: jnp.ndarray, size: int,
                       rng: jax.Array):
    """Identical per-sample random crops on two aligned (N, H, W) stacks
    (paired fine-tuning: the LR/HR windows must match)."""
    n, h, w = a.shape
    k1, k2 = jax.random.split(rng)
    tops = jax.random.randint(k1, (n,), 0, h - size + 1)
    lefts = jax.random.randint(k2, (n,), 0, w - size + 1)

    def crop_one(img, top, left):
        return jax.lax.dynamic_slice(img, (top, left), (size, size))

    return (jax.vmap(crop_one)(a, tops, lefts),
            jax.vmap(crop_one)(b, tops, lefts))


def center_crop(imgs: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = imgs.shape[-2], imgs.shape[-1]
    top, left = (h - size) // 2, (w - size) // 2
    return imgs[..., top:top + size, left:left + size]


def bicubic_resize(imgs: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Batched bicubic resize on device (torchvision Resize BICUBIC)."""
    n = imgs.shape[0]
    return jax.image.resize(imgs, (n,) + tuple(out_hw), method="bicubic")


@functools.partial(jax.jit, static_argnums=(1,))
def preprocess_train_a(imgs_u8: jnp.ndarray, size_a: int,
                       rng: jax.Array) -> jnp.ndarray:
    """(N, H, W) uint8 -> (N, 1, 2*size_a, 2*size_a) in [-1, 1]."""
    x = to_unit(imgs_u8)
    x = random_crop(x, size_a, rng)
    x = bicubic_resize(x, (size_a * 2, size_a * 2))
    x = normalize(x)
    return x[:, None]


@functools.partial(jax.jit, static_argnums=(1,))
def preprocess_train_b(imgs_u8: jnp.ndarray, size_b: int,
                       rng: jax.Array) -> jnp.ndarray:
    """(N, H, W) uint8 -> (N, 1, size_b, size_b) in [-1, 1]."""
    x = normalize(to_unit(imgs_u8))
    x = random_crop(x, size_b, rng)
    return x[:, None]


@functools.partial(jax.jit, static_argnums=(1,))
def preprocess_eval(imgs_u8: jnp.ndarray, size: int = 256) -> jnp.ndarray:
    x = normalize(to_unit(imgs_u8))
    x = center_crop(x, size)
    return x[:, None]
