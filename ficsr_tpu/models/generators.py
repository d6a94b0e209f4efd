"""Generator family (reference `/root/reference/model.py:238-506`).

Two-branch frequency generators:

  * `NetworkA2B` (LR->HR, model.py:238-268): LF image -> shallow conv
    encoder; HF image -> strided stem -> 8-block ResNet -> skip fusion;
    concat -> transposed-conv head -> tanh SR image.  Returns
    (lf_feature, hf_feature, image) — the features feed the
    inverse-consistency BCE loss (train.py:230-231).
  * `NetworkB2A` (HR->LR, model.py:271-298): mirrored branch layout.
  * `ResnetGenerator` (model.py:444-480), `ShallowNet` (model.py:423-442),
    `ResBlock` (model.py:403-421 / 483-506 — the two reference classes
    are structurally identical), `UnetGenerator` (model.py:302-400,
    constructed-but-unused in the reference's NetworkA2B; provided for
    component parity, including the outermost-block truncation at
    model.py:373).

All modules thread `train` for BatchNorm mode.  The reference's dead
`unet`/`unet_up`/`skip`(B2A) members are NOT instantiated here — flax
only materializes parameters for modules that run, and the weight
converter skips those keys (convert/from_torch.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ficsr_tpu.models.layers import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    channel_axis,
    from_internal,
    get_fold,
    get_layout,
    leaky_relu,
    reflection_pad2d,
    to_internal,
    width_fold,
    width_unfold,
)


def _in_fold_region(x: jnp.ndarray, scope: str = "shallow") -> bool:
    """Whether to run the following qualifying chain width-folded
    (persistent-fold MFU optimization, exact same function; see
    layers.use_fold).

    scope 'shallow' (the ShallowNet / shallow-frequency chains) folds
    under both 'region' and 'region-shallow'; scope 'resnet' (the
    ResnetGenerator stem chain) only under the full 'region' mode —
    'region-shallow' is the r4 hybrid that keeps the resnet body plain
    where large-batch tiling already fills the MXU."""
    mode = get_fold()
    in_region = (mode == "region"
                 or (mode == "region-shallow" and scope == "shallow"))
    return (in_region and get_layout() == "NHWC"
            and x.ndim == 4 and x.shape[2] % 2 == 0)

__all__ = [
    "ResBlock",
    "ResnetGenerator",
    "ShallowNet",
    "NetworkA2B",
    "NetworkB2A",
    "UnetGenerator",
]


class ResBlock(nn.Module):
    """conv3x3 -> BN -> ReLU -> conv3x3 -> BN, identity skip."""

    dim: int = 64
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = Conv2d(self.dim, self.dim, 3, 1, 1, use_bias=self.use_bias,
                   name="conv1")(x)
        h = BatchNorm2d(self.dim, name="bn1")(h, train)
        h = nn.relu(h)
        h = Conv2d(self.dim, self.dim, 3, 1, 1, use_bias=self.use_bias,
                   name="conv2")(h)
        h = BatchNorm2d(self.dim, name="bn2")(h, train)
        return x + h


class ResnetGenerator(nn.Module):
    """7x7 stem -> 2x stride-2 down -> n_blocks residual -> 2x up -> 7x7 out.

    No final tanh (reference comments it out, model.py:474).  The final
    7x7 conv keeps its default bias (model.py:473); all normed convs are
    bias-free (BatchNorm branch, model.py:448).
    """

    input_nc: int = 64
    output_nc: int = 64
    ngf: int = 64
    n_blocks: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        ngf = self.ngf
        h = reflection_pad2d(x, 3)
        # fold region over the 64-lane stem chain: the 7x7 valid conv at
        # full 128-lane contraction (1.14x FLOP redundancy only), folded
        # BN/ReLU, and down0 consuming the fold for free (stride-2 fine
        # conv == phase-selected coarse conv).  128-ch inputs (B2A)
        # already fill the MXU lanes — folding would only add FLOPs.
        fold = self.input_nc <= 64 and _in_fold_region(h, scope="resnet")
        if fold:
            h = width_fold(h)
        h = Conv2d(self.input_nc, ngf, 7, 1, 0, use_bias=False, name="stem")(h)
        h = BatchNorm2d(ngf, name="stem_bn")(h, train)
        h = nn.relu(h)
        for i in range(2):
            mult = 2 ** i
            h = Conv2d(ngf * mult, ngf * mult * 2, 3, 2, 1, use_bias=False,
                       name=f"down{i}")(h)
            h = BatchNorm2d(ngf * mult * 2, name=f"down{i}_bn")(h, train)
            h = nn.relu(h)
        mult = 4
        for i in range(self.n_blocks):
            h = ResBlock(ngf * mult, name=f"block{i}")(h, train)
        for i in range(2):
            mult = 2 ** (2 - i)
            h = ConvTranspose2d(ngf * mult, ngf * mult // 2, 3, 2, 1,
                                output_padding=1, use_bias=False,
                                name=f"up{i}")(h)
            h = BatchNorm2d(ngf * mult // 2, name=f"up{i}_bn")(h, train)
            h = nn.relu(h)
        h = reflection_pad2d(h, 3)
        h = Conv2d(ngf, self.output_nc, 7, 1, 0, use_bias=True, name="head")(h)
        return h


class ShallowNet(nn.Module):
    """Fusion/output head (reference shallowNet, model.py:423-442):
    ReLU -> (ConvT4x4s2 if up else conv3x3) -> BN(64) -> 3x ResBlock ->
    ReLU -> conv3x3 -> Tanh."""

    in_dim: int = 128
    out_dim: int = 1
    up: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = nn.relu(x)
        if self.up:
            h = ConvTranspose2d(self.in_dim, 64, 4, 2, 1, use_bias=False,
                                name="proj")(h)
        else:
            h = Conv2d(self.in_dim, 64, 3, 1, 1, use_bias=False, name="proj")(h)
        # fold region over the dominant 3x3/64ch chain (proj_bn ->
        # 3 ResBlocks -> head): one fold of the 64-ch activation, one
        # unfold of the out_dim-ch (1-ch) output — everything between
        # runs at full 128-lane MXU contraction with folded-exact BN.
        fold = _in_fold_region(h)
        if fold:
            h = width_fold(h)
        h = BatchNorm2d(64, name="proj_bn")(h, train)
        for i in range(3):
            h = ResBlock(64, name=f"block{i}")(h, train)
        h = nn.relu(h)
        h = Conv2d(64, self.out_dim, 3, 1, 1, use_bias=False, name="head")(h)
        if fold:
            h = width_unfold(h)
        return jnp.tanh(h)


class _ShallowFrequencyEncoder(nn.Module):
    """conv4x4s2(1->64) -> LReLU -> conv3x3(64->128)+BN -> ReLU ->
    conv3x3(128->64)+BN (model.py:242-246 / 275-279)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = Conv2d(1, 64, 4, 2, 1, use_bias=False, name="conv0")(x)
        h = leaky_relu(h, 0.2)
        h = Conv2d(64, 128, 3, 1, 1, use_bias=False, name="conv1")(h)
        h = BatchNorm2d(128, name="bn1")(h, train)
        h = nn.relu(h)
        h = Conv2d(128, 64, 3, 1, 1, use_bias=False, name="conv2")(h)
        h = BatchNorm2d(64, name="bn2")(h, train)
        return h


class NetworkA2B(nn.Module):
    """LR->HR generator. __call__(lf, hf) -> (lf_feature, hf_feature, sr).

    Inputs/outputs are NCHW regardless of the active activation layout
    (layers.set_layout) — internal tensors are transposed at this
    boundary only."""

    @nn.compact
    def __call__(self, lf: jnp.ndarray, hf: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        lf, hf = to_internal(lf), to_internal(hf)
        cax = channel_axis()
        lf_feature = _ShallowFrequencyEncoder(name="shallow_frequency")(lf, train)
        hf_in = Conv2d(1, 64, 4, 2, 1, use_bias=False, name="A2B_input")(hf)
        res = ResnetGenerator(64, 64, n_blocks=8, name="resnet")(hf_in, train)
        fused = jnp.concatenate([hf_in, res], axis=cax)
        h = nn.relu(fused)
        h = Conv2d(128, 64, 3, 1, 1, use_bias=False, name="skip")(h)
        hf_feature = BatchNorm2d(64, name="skip_bn")(h, train)
        sr = ShallowNet(128, 1, up=True, name="shallow_up")(
            jnp.concatenate([lf_feature, hf_feature], axis=cax), train
        )
        return (from_internal(lf_feature), from_internal(hf_feature),
                from_internal(sr))


class NetworkB2A(nn.Module):
    """HR->LR generator. __call__(hf, lf) -> (hf_feature, lf_feature, lr)."""

    @nn.compact
    def __call__(self, hf: jnp.ndarray, lf: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        hf, lf = to_internal(hf), to_internal(lf)
        hf_feature = _ShallowFrequencyEncoder(name="shallow_frequency")(hf, train)
        lf_in = Conv2d(1, 128, 4, 2, 1, use_bias=False, name="B2A_input")(lf)
        lf_feature = ResnetGenerator(128, 64, n_blocks=8, name="resnet")(
            lf_in, train)
        lr = ShallowNet(128, 1, up=True, name="shallow_up")(
            jnp.concatenate([hf_feature, lf_feature], axis=channel_axis()),
            train
        )
        return (from_internal(hf_feature), from_internal(lf_feature),
                from_internal(lr))


class UnetSkipConnectionBlock(nn.Module):
    """Reference model.py:336-400, including the use_dropout=True default
    and the outermost truncation (down + submodule only, model.py:373)."""

    outer_nc: int
    inner_nc: int
    input_nc: int = -1  # -1 => outer_nc
    submodule: nn.Module = None
    outermost: bool = False
    innermost: bool = False
    use_dropout: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 deterministic: bool = True) -> jnp.ndarray:
        input_nc = self.input_nc if self.input_nc > 0 else self.outer_nc
        if self.outermost:
            # model = down + [submodule] ONLY (model.py:373) — the up
            # path is constructed but dropped in the reference.
            h = Conv2d(input_nc, self.inner_nc, 4, 2, 1, use_bias=True,
                       name="downconv")(x)
            return self.submodule(h, train, deterministic)
        if self.innermost:
            h = leaky_relu(x, 0.2)
            h = Conv2d(input_nc, self.inner_nc, 4, 2, 1, use_bias=True,
                       name="downconv")(h)
            h = nn.relu(h)
            h = ConvTranspose2d(self.inner_nc, self.outer_nc, 4, 2, 1,
                                use_bias=True, name="upconv")(h)
            h = BatchNorm2d(self.outer_nc, name="upnorm")(h, train)
            return jnp.concatenate([x, h], axis=channel_axis())
        h = leaky_relu(x, 0.2)
        h = Conv2d(input_nc, self.inner_nc, 4, 2, 1, use_bias=True,
                   name="downconv")(h)
        h = BatchNorm2d(self.inner_nc, name="downnorm")(h, train)
        h = self.submodule(h, train, deterministic)
        h = nn.relu(h)
        h = ConvTranspose2d(self.inner_nc * 2, self.outer_nc, 4, 2, 1,
                            use_bias=True, name="upconv")(h)
        h = BatchNorm2d(self.outer_nc, name="upnorm")(h, train)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=deterministic)(h)
        return jnp.concatenate([x, h], axis=channel_axis())


class UnetGenerator(nn.Module):
    """Reference UnetGenerator (model.py:302-332) — dead code path in the
    reference's NetworkA2B forward, provided for component parity
    (SURVEY §2a #6).  Construction mirrors model.py:317-326: innermost
    8ngf block, (num_downs-5) dropout middle blocks at 8ngf, then
    8->4->2->1 ngf reductions, then the truncated outermost block."""

    input_nc: int = 1
    output_nc: int = 1
    num_downs: int = 8
    ngf: int = 64
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 deterministic: bool = True) -> jnp.ndarray:
        ngf = self.ngf
        block = UnetSkipConnectionBlock(
            ngf * 8, ngf * 8, innermost=True, name="inner")
        for i in range(self.num_downs - 5):
            block = UnetSkipConnectionBlock(
                ngf * 8, ngf * 8, submodule=block,
                use_dropout=self.use_dropout, name=f"mid{i}")
        block = UnetSkipConnectionBlock(ngf * 4, ngf * 8, submodule=block,
                                        name="up3")
        block = UnetSkipConnectionBlock(ngf * 2, ngf * 4, submodule=block,
                                        name="up2")
        block = UnetSkipConnectionBlock(ngf, ngf * 2, submodule=block,
                                        name="up1")
        block = UnetSkipConnectionBlock(
            self.output_nc, ngf, input_nc=self.input_nc, submodule=block,
            outermost=True, name="outer")
        return from_internal(block(to_internal(x), train, deterministic))
