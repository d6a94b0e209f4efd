"""PatchGAN + frequency-aware discriminators (reference model.py:86-235).

`FSDiscriminator` runs a PatchGAN on the raw image and a second
PatchGAN on Haar DWT subbands (J=1, reflect — `model.py:140,190`),
blending the two global-average-pooled verdicts 0.7/0.3
(`model.py:154-164, 207-217`).  Domain A uses cs='sum' (DWT branch sees
the LL subband), domain B uses cs='cat' (3-channel LH|HL|HH input,
renormalized *0.5+0.5, `model.py:222-235`).

The Haar J=1 transform comes from our wavelet library's fast path
(pure 2x2 block arithmetic on the VPU, optionally the fused Pallas
kernel) — this op runs 8x per training step (4 D calls x fwd+bwd), it
is the reason the DWT must be differentiable.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ficsr_tpu.models.layers import (
    BatchNorm2d, Conv2d, leaky_relu, spatial_axes, to_internal)
from ficsr_tpu.wavelets import dwt2

__all__ = ["PatchGAN", "FSDiscriminator", "FSDiscriminatorA",
           "FSDiscriminatorB", "filter_wavelet"]


def filter_wavelet(x: jnp.ndarray, cs: str = "sum", sum_band: str = "ll",
                   norm: bool = True):
    """Reference ``filter_wavelet`` (model.py:166-178, 222-235).

    Returns, per ``cs``:
      * 'sum'  -> (band, x) where band = LL for FS_DiscriminatorA
                  (model.py:171-172) or HH for FS_DiscriminatorB
                  (model.py:227-228)
      * 'each' -> (LL, LH, HL, HH, x)   (model.py:174-175, 230-231)
      * 'cat'  -> (LH|HL|HH concat on channels, x)

    Only LH/HL/HH are renormalized (*0.5+0.5) when ``norm``; LL never is
    — matching the reference exactly.  Note the reference's own forward
    unpacks ``dwt, ximg = self.filter(x)``, so 'each' (a 5-tuple) is
    dead there; it is fully supported here.
    """
    ll, highs = dwt2(x, "haar", "reflect")
    lh, hl, hh = highs[:, :, 0], highs[:, :, 1], highs[:, :, 2]
    if norm:
        lh, hl, hh = lh * 0.5 + 0.5, hl * 0.5 + 0.5, hh * 0.5 + 0.5
    cs = cs.lower()
    if cs == "sum":
        return (ll if sum_band == "ll" else hh), x
    if cs == "each":
        return ll, lh, hl, hh, x
    if cs == "cat":
        return jnp.concatenate([lh, hl, hh], axis=1), x
    raise NotImplementedError(f"Wavelet format [{cs}] not recognized")


class PatchGAN(nn.Module):
    """n_layers-deep PatchGAN (reference Discriminator, model.py:86-127).

    4x4 convs, stride 2 with channel doubling capped at 8x, then two
    stride-1 layers; all convs biased; BatchNorm + LeakyReLU(0.2).
    """

    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        ndf = self.ndf
        h = Conv2d(self.input_nc, ndf, 4, 2, 1, use_bias=True, name="conv0")(x)
        h = leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult_prev, nf_mult = nf_mult, min(2 ** n, 8)
            h = Conv2d(ndf * nf_mult_prev, ndf * nf_mult, 4, 2, 1,
                       use_bias=True, name=f"conv{n}")(h)
            h = BatchNorm2d(ndf * nf_mult, name=f"bn{n}")(h, train)
            h = leaky_relu(h, 0.2)
        nf_mult_prev, nf_mult = nf_mult, min(2 ** self.n_layers, 8)
        h = Conv2d(ndf * nf_mult_prev, ndf * nf_mult, 4, 1, 1,
                   use_bias=True, name="conv_s1")(h)
        h = BatchNorm2d(ndf * nf_mult, name="bn_s1")(h, train)
        h = leaky_relu(h, 0.2)
        h = Conv2d(ndf * nf_mult, 1, 4, 1, 1, use_bias=True, name="head")(h)
        return h


class FSDiscriminator(nn.Module):
    """Frequency-aware discriminator; cs='sum' -> reference
    FS_DiscriminatorA, cs='cat' -> FS_DiscriminatorB."""

    cs: str = "sum"
    # which band the 'sum' mode forwards: FS_DiscriminatorA returns LL
    # (model.py:171-172) but FS_DiscriminatorB's (unused) 'sum' branch
    # returns HH (model.py:227-228)
    sum_band: str = "ll"
    # PatchGAN depth; 5 is the reference value (model.py:89) and sets a
    # 256^2 minimum image size (DWT halves + 5 stride-2 layers).
    # Smaller values allow tiny-shape dry runs.
    n_layers: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        cs = self.cs.lower()
        if cs == "each":
            # The reference's forward unpacks `dwt, ximg = self.filter(x)`
            # and a 5-tuple raises there too (model.py:155,208); use
            # filter_wavelet() directly for the per-band tuple.
            raise ValueError(
                "cs='each' yields a 5-tuple the discriminator forward "
                "cannot consume (dead in the reference too); call "
                "filter_wavelet(x, cs='each') directly")
        # filter_wavelet stays NCHW (the wavelet library's layout);
        # the PatchGAN towers run in the active activation layout
        dwt_in, x = filter_wavelet(x, cs, self.sum_band)
        dwt_in, x = to_internal(dwt_in), to_internal(x)
        dwt_nc = 3 if cs == "cat" else 1
        sp = spatial_axes()

        spatial = PatchGAN(input_nc=1, n_layers=self.n_layers,
                           name="net")(x, train)
        x_d = jnp.mean(spatial, axis=sp)                    # global avg pool
        dwt_out = PatchGAN(input_nc=dwt_nc, n_layers=self.n_layers,
                           name="net_dwt")(dwt_in, train)
        dwt_d = jnp.mean(dwt_out, axis=sp)
        return jnp.ravel(0.7 * x_d + 0.3 * dwt_d)           # model.py:164,217


def FSDiscriminatorA(**kw) -> FSDiscriminator:
    """Reference FS_DiscriminatorA (model.py:132-179): cs='sum'."""
    return FSDiscriminator(cs="sum", sum_band="ll", **kw)


def FSDiscriminatorB(**kw) -> FSDiscriminator:
    """Reference FS_DiscriminatorB (model.py:182-235): cs='cat'."""
    return FSDiscriminator(cs="cat", sum_band="hh", **kw)
