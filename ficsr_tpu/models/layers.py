"""Torch-semantics conv/norm primitives in Flax (NCHW, OIHW kernels).

Keeping the reference's tensor layout and kernel shape at the module
boundary makes PyTorch weight conversion a pure tree re-keying (no
transposes), while XLA still relayouts internally for the TPU conv
engine.  Initializers replicate `weights_init_normal`
(`/root/reference/utils.py:63-69`): conv kernels ~ N(0, 0.02), BatchNorm
scale ~ N(1, 0.02), biases zero.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "Conv2d",
    "ConvTranspose2d",
    "BatchNorm2d",
    "conv_init",
    "bn_scale_init",
    "reflection_pad2d",
    "leaky_relu",
]


def conv_init(key, shape, dtype=jnp.float32):
    """N(0, 0.02) — reference weights_init_normal for Conv layers."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def bn_scale_init(key, shape, dtype=jnp.float32):
    """N(1, 0.02) — reference weights_init_normal for BatchNorm2d."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def reflection_pad2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """nn.ReflectionPad2d equivalent for NCHW."""
    return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


class Conv2d(nn.Module):
    """torch.nn.Conv2d semantics: NCHW input, OIHW kernel, symmetric pad."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        w = self.param(
            "weight", conv_init,
            (self.out_channels, self.in_channels, k, k),
        )
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b.astype(x.dtype)[None, :, None, None]
        return y


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d semantics (stride, padding, output_padding).

    Lowered to one input-dilated conv: lhs_dilation = stride, spatial
    pad (k-1-p, k-1-p+output_padding), kernel flipped and transposed —
    mathematically identical to torch, and a single XLA conv op.
    Kernel is stored torch-shaped: (in, out, kh, kw).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        w = self.param(
            "weight", conv_init,
            (self.in_channels, self.out_channels, k, k),
        )
        # (I, O, kh, kw) -> (O, I, kh, kw), spatially flipped
        w_t = jnp.transpose(w, (1, 0, 2, 3))[:, :, ::-1, ::-1]
        lo = k - 1 - self.padding
        hi = k - 1 - self.padding + self.output_padding
        y = lax.conv_general_dilated(
            x, w_t.astype(x.dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b.astype(x.dtype)[None, :, None, None]
        return y


class BatchNorm2d(nn.Module):
    """torch.nn.BatchNorm2d semantics on NCHW (eps 1e-5, momentum 0.1).

    torch updates running stats as (1-m)*running + m*batch with m=0.1;
    flax's convention is momentum*ra + (1-momentum)*batch, so
    flax-momentum = 0.9.  At batch size 1 (the reference's training
    regime) train-mode BN normalizes each sample by its own spatial
    statistics, which we reproduce exactly.
    """

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        scale = self.param("weight", bn_scale_init, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        ra_mean = self.variable(
            "batch_stats", "running_mean",
            lambda: jnp.zeros((self.num_features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "running_var",
            lambda: jnp.ones((self.num_features,), jnp.float32),
        )
        if train:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 2, 3))
            var = jnp.var(x32, axis=(0, 2, 3))
            n = x.shape[0] * x.shape[2] * x.shape[3]
            if not self.is_initializing():
                # torch tracks the *unbiased* variance in running stats
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + \
                    self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + \
                    self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = lax.rsqrt(var + self.eps) * scale
        y = (x - mean[None, :, None, None].astype(x.dtype)) * \
            inv[None, :, None, None].astype(x.dtype) + \
            bias[None, :, None, None].astype(x.dtype)
        return y
