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


# torch F.interpolate(mode='bicubic') fixed-phase weights for exact 2x
# upscale with half-pixel centers: out[2k] samples src k-0.25 (t=0.75),
# out[2k+1] samples src k+0.25 (t=0.25); Keys cubic with a=-0.75 (torch's
# coefficient — PIL and jax.image.resize use a=-0.5, measurably different:
# max |delta| 0.076 on [0,1] data).  Taps cover src f-1..f+2 with
# edge-replicate clamping, matching torch's index clamp.
_BICUBIC_T25 = (-0.10546875, 0.87890625, 0.26171875, -0.03515625)
_BICUBIC_T75 = tuple(reversed(_BICUBIC_T25))


def _up2_last_axis(x: jnp.ndarray) -> jnp.ndarray:
    """Exact torch-bicubic 2x upscale along the last axis."""
    xp = jnp.concatenate(
        [x[..., :1], x[..., :1], x, x[..., -1:], x[..., -1:]], axis=-1)
    n = x.shape[-1]
    even = sum(w * jax.lax.slice_in_dim(xp, j, j + n, axis=-1)
               for j, w in enumerate(_BICUBIC_T75))
    odd = sum(w * jax.lax.slice_in_dim(xp, j + 1, j + 1 + n, axis=-1)
              for j, w in enumerate(_BICUBIC_T25))
    return jnp.stack([even, odd], axis=-1).reshape(x.shape[:-1] + (2 * n,))


def bicubic_resize(imgs: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Batched bicubic resize on device (reference train.py:132
    `transforms.Resize(..., interpolation=Image.BICUBIC)` applied to a
    tensor = torch F.interpolate bicubic, align_corners=False).

    The training pipeline always upscales exactly 2x; that case is
    bit-accurate to torch (fixed-phase separable 4-tap kernel, parity
    tested to 1e-6).  Any other geometry falls back to
    ``jax.image.resize`` (a=-0.5 cubic; documented delta vs torch)."""
    h, w = imgs.shape[-2], imgs.shape[-1]
    if tuple(out_hw) == (2 * h, 2 * w):
        x = _up2_last_axis(imgs)                       # width
        x = _up2_last_axis(x.swapaxes(-1, -2)).swapaxes(-1, -2)  # height
        return x
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
