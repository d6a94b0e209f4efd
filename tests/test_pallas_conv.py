"""Experimental im2col Pallas conv: interpret-mode correctness
(compiled-mode status documented in ops/pallas_conv.py)."""

import numpy as np
import jax.numpy as jnp
from jax import lax

from ficsr_tpu.ops.pallas_conv import conv3x3_im2col


def test_matches_xla_conv(rng):
    x = jnp.asarray(rng.randn(2, 64, 32, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 64, 3, 3).astype(np.float32) * 0.05)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    got = conv3x3_im2col(x, w, th=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_rect_and_tile_sizes(rng):
    x = jnp.asarray(rng.randn(1, 32, 16, 48).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 32, 3, 3).astype(np.float32) * 0.05)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    got = conv3x3_im2col(x, w, th=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
