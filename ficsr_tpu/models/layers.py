"""Torch-semantics conv/norm primitives in Flax (OIHW kernels, NCHW or
NHWC activations).

Parameter shapes always stay torch-shaped (OIHW), so PyTorch weight
conversion is a pure tree re-keying and checkpoints are layout-free.
The *activation* layout inside the models is switchable:

  * ``NCHW`` (default) — the reference's layout; what every test and
    the CPU path uses.
  * ``NHWC`` — channels-last.  Measured on TPU v5e (bf16, b16; see
    benchmarks/conv_experiments.json): 1.57x faster forward on the
    dominant 3x3/64ch/256^2 class and 1.42x on the 7x7 stems, neutral
    for fwd+bwd — so it is the inference-layout default on TPU.

The network-level modules (NetworkA2B/B2A, FSDiscriminatorA/B,
UnetGenerator) keep an NCHW *boundary* regardless: inputs/outputs are
transposed at entry/exit via `to_internal`/`from_internal`, so callers,
losses, parity tests, and converters never see the internal layout.
(PatchGAN is an *internal* building block of FSDiscriminator and runs
in the active internal layout — call it directly only with tensors
already in that layout.)

Initializers replicate `weights_init_normal`
(`/root/reference/utils.py:63-69`): conv kernels ~ N(0, 0.02), BatchNorm
scale ~ N(1, 0.02), biases zero.
"""

from __future__ import annotations

import contextlib

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
    "set_layout",
    "get_layout",
    "use_layout",
    "use_fold",
    "get_fold",
    "width_fold",
    "width_unfold",
    "use_streams",
    "get_streams",
    "channel_axis",
    "spatial_axes",
    "to_internal",
    "from_internal",
]

_LAYOUT = "NCHW"


def set_layout(layout: str) -> None:
    """Set the global activation layout ('NCHW' or 'NHWC').

    Call before building/compiling any step or inference function —
    jitted programs bake the layout in at trace time.
    """
    global _LAYOUT
    if layout not in ("NCHW", "NHWC"):
        raise ValueError(f"layout must be NCHW or NHWC, got {layout!r}")
    _LAYOUT = layout


def get_layout() -> str:
    return _LAYOUT


@contextlib.contextmanager
def use_layout(layout: str):
    """Scoped layout override (tests)."""
    prev = _LAYOUT
    set_layout(layout)
    try:
        yield
    finally:
        set_layout(prev)


_FOLD = False

# Persistent-fold-region modes: 'region' folds every qualifying chain
# (ResnetGenerator 64-ch stem + both ShallowNet chains); 'region-shallow'
# folds only the ShallowNet chains and leaves the ResnetGenerator plain —
# the r4 hybrid probed for b>=96 inference where the plain path's
# batch-tiling already fills the MXU on the resnet body.
_REGION_MODES = ("region", "region-shallow")


def get_fold() -> bool:
    return _FOLD


@contextlib.contextmanager
def use_fold(enabled: bool = True):
    """Trace-scoped width-fold (space-to-depth) conv formulation.

    Inside this context, qualifying Conv2d calls (NHWC layout, stride 1,
    odd kernel, 'same' or valid padding, 32<=Cin<=64, Cout>=32, even
    width) are computed as an *algebraically identical* conv on a
    width-folded layout: (B,H,W,C) -> (B,H,W/2,2C) is a free reshape in
    NHWC row-major memory, and the fine conv becomes a coarse conv with
    a zero-structured kernel at full 128-lane MXU contraction depth
    (2C=128 for the reference's 64-channel classes, which half-fill the
    lanes and were the measured ~3x train-step MFU gap).

    Measured v5e b16-bf16 per conv (benchmarks/conv_experiments.json):
    fwd+bwd 3x3/64ch/256^2 5.08 -> 4.21 ms, 7x7/64ch/128^2 5.65 ->
    3.60 ms; fwd-only is ~7% SLOWER (the 2x kernel-zero FLOP redundancy
    outweighs the MXU gain without the backward's conv shapes), so this
    is enabled inside the differentiated train step only — inference
    keeps plain convs.

    ``enabled="region"`` selects the *persistent-fold region* mode
    instead: no conv folds on its own — model code folds ONCE at the
    entry of a chain of qualifying ops (`width_fold`), every Conv2d /
    BatchNorm2d inside the region detects the folded input (channel
    count doubled vs its declaration) and computes directly in the
    folded layout, and the chain unfolds once at its exit
    (`width_unfold`).  Stride-2 convs at a region exit consume the
    folded input and emit a normally-laid-out output for free (the
    phase-selected kernel of a stride-2 fine conv needs no unfold).
    This removes the per-conv fold/unfold lane-relayouts that made the
    per-conv mode a net loss on the full train step (518 vs 464 ms —
    benchmarks/README.md round 3).
    """
    global _FOLD
    prev = _FOLD
    _FOLD = enabled if isinstance(enabled, str) else bool(enabled)
    try:
        yield
    finally:
        _FOLD = prev


_STREAMS = 1


def get_streams() -> int:
    return _STREAMS


@contextlib.contextmanager
def use_streams(n: int):
    """Trace-scoped stream count for stream-batched forwards.

    Inside this context a batch axis of size ``n*N`` is treated as ``n``
    independent streams of ``N`` samples stacked along the batch axis.
    Convolutions and elementwise ops are naturally per-sample; only
    BatchNorm2d changes behavior: train-mode statistics are computed
    *per stream* and running stats are updated sequentially in stream
    order — making one batched apply bit-identical (values, gradients,
    and running-stat threading) to ``n`` sequential applies.  This is
    how train/step.py folds the reference's six generator passes
    (`/root/reference/train.py:170-214`) into four larger XLA convs.
    """
    global _STREAMS
    prev = _STREAMS
    _STREAMS = int(n)
    try:
        yield
    finally:
        _STREAMS = prev


def channel_axis() -> int:
    return 1 if _LAYOUT == "NCHW" else 3


def spatial_axes() -> tuple:
    return (2, 3) if _LAYOUT == "NCHW" else (1, 2)


def to_internal(x: jnp.ndarray) -> jnp.ndarray:
    """NCHW boundary tensor -> internal activation layout."""
    return x if _LAYOUT == "NCHW" else jnp.transpose(x, (0, 2, 3, 1))


def from_internal(x: jnp.ndarray) -> jnp.ndarray:
    """Internal activation layout -> NCHW boundary tensor."""
    return x if _LAYOUT == "NCHW" else jnp.transpose(x, (0, 3, 1, 2))


def width_fold(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/2, 2C) — phase-major column fold.

    A free reshape in NHWC row-major memory: coarse column j holds
    [fine col 2j (C channels), fine col 2j+1 (C channels)].  Entry point
    of a persistent fold region (``use_fold("region")``).
    """
    b, h, w, c = x.shape
    if w % 2:
        raise ValueError(f"width_fold needs even width, got {w}")
    return x.reshape(b, h, w // 2, 2 * c)


def width_unfold(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W/2, 2C) -> (B, H, W, C) — inverse of `width_fold`."""
    b, h, w2, c2 = x.shape
    if c2 % 2:
        raise ValueError(f"width_unfold needs even channels, got {c2}")
    return x.reshape(b, h, 2 * w2, c2 // 2)


def conv_init(key, shape, dtype=jnp.float32):
    """N(0, 0.02) — reference weights_init_normal for Conv layers."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def bn_scale_init(key, shape, dtype=jnp.float32):
    """N(1, 0.02) — reference weights_init_normal for BatchNorm2d."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def reflection_pad2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """nn.ReflectionPad2d equivalent (layout-aware)."""
    if _LAYOUT == "NCHW":
        widths = ((0, 0), (0, 0), (pad, pad), (pad, pad))
    else:
        widths = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    return jnp.pad(x, widths, mode="reflect")


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


def _width_fold_kernel(w: jnp.ndarray, padding: int) -> jnp.ndarray:
    """HWIO fine kernel -> zero-structured coarse kernel for r=2 width-fold.

    Output fine col 2j+q, tap kx: input fine col f lands on coarse col
    j+u, input phase p.  'Same' pad (padding==kw//2): f=q+kx-m centered,
    coarse kernel width 2*((m+1)//2)+1.  Valid (padding==0): f=q+kx,
    coarse width (kw+1)//2 — only (2*kwc/kw)x FLOP redundancy (1.14x for
    the reflection-padded 7x7 stems vs 2x for same-pad 3x3).
    """
    kh, kw, c, co = w.shape
    if padding == 0:
        kwc = (kw + 1) // 2
        taps = [(q, kx, (q + kx) // 2, (q + kx) % 2)
                for q in range(2) for kx in range(kw)]
    else:
        m = kw // 2
        hw = (m + 1) // 2
        kwc = 2 * hw + 1
        taps = [(q, kx, (q + kx - m) // 2 + hw, (q + kx - m) % 2)
                for q in range(2) for kx in range(kw)]
    wf = jnp.zeros((kh, kwc, 2 * c, 2 * co), w.dtype)
    for q, kx, u, p in taps:
        wf = wf.at[:, u, p * c:(p + 1) * c, q * co:(q + 1) * co].set(w[:, kx])
    return wf


def _strided_consume_kernel(w: jnp.ndarray, padding: int):
    """HWIO fine kernel -> kernel consuming folded input for a stride-2 conv.

    A stride-2 fine conv only ever produces even-phase output columns,
    so on a folded input it is a stride-(2,1) coarse conv with an
    UNFOLDED output: output col o reads fine col f = 2o + kx - padding,
    i.e. coarse col o + f//2, phase f%2.  Returns (kernel, (pad_lo,
    pad_hi)) for the coarse W axis.  This lets a region exit into a
    stride-2 conv with zero relayout cost.
    """
    kh, kw, c, co = w.shape
    taps = [(kx, (kx - padding) // 2, (kx - padding) % 2)
            for kx in range(kw)]
    dmin = min(d for _, d, _ in taps)
    dmax = max(d for _, d, _ in taps)
    wf = jnp.zeros((kh, dmax - dmin + 1, 2 * c, co), w.dtype)
    for kx, du, ph in taps:
        wf = wf.at[:, du - dmin, ph * c:(ph + 1) * c, :].set(w[:, kx])
    return wf, (max(0, -dmin), max(0, dmax))


class Conv2d(nn.Module):
    """torch.nn.Conv2d semantics: NCHW input, OIHW kernel, symmetric pad."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    def _foldable(self, x: jnp.ndarray) -> bool:
        k = self.kernel_size
        if _FOLD in _REGION_MODES:
            # region mode: convs never fold on their own — the model
            # folds at region entry and __call__ detects folded input
            return False
        if _FOLD == "k7" and k < 5:
            # fold only the large-kernel (7x7 valid) class: its fold has
            # just 1.14x FLOP redundancy and the largest measured win
            return False
        return (_FOLD and _LAYOUT == "NHWC" and self.stride == 1
                and k > 1 and k % 2 == 1
                and self.padding in (0, k // 2)
                and 32 <= self.in_channels <= 64
                and self.out_channels >= 32
                and x.shape[2] % 2 == 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        w = self.param(
            "weight", conv_init,
            (self.out_channels, self.in_channels, k, k),
        )
        w = w.astype(x.dtype)
        folded_in = (_FOLD in _REGION_MODES and _LAYOUT == "NHWC"
                     and x.ndim == 4 and x.shape[3] == 2 * self.in_channels)
        if folded_in:
            # persistent fold region: input is width-folded (see
            # use_fold docstring).  Stride-1 odd-kernel convs stay
            # folded; stride-2 convs consume the fold and emit a
            # normally-laid-out output (region exit for free).
            wf = jnp.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
            if self.stride == 1 and k % 2 == 1 \
                    and self.padding in (0, k // 2):
                wk = _width_fold_kernel(wf, self.padding)
                pw = 0 if self.padding == 0 else (k // 2 + 1) // 2
                y = lax.conv_general_dilated(
                    x, wk, window_strides=(1, 1),
                    padding=((self.padding, self.padding), (pw, pw)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                folded_out = True
            elif self.stride == 2 and k % 2 == 1:
                wk, (plo, phi) = _strided_consume_kernel(wf, self.padding)
                y = lax.conv_general_dilated(
                    x, wk, window_strides=(2, 1),
                    padding=((self.padding, self.padding), (plo, phi)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                folded_out = False
            else:
                raise ValueError(
                    f"Conv2d(k={k}, stride={self.stride}, "
                    f"padding={self.padding}) cannot run on a folded "
                    "input — unfold before this layer")
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.out_channels,))
                b = b.astype(x.dtype)
                y = y + (jnp.concatenate([b, b]) if folded_out else b)
            return y
        if self._foldable(x):
            # width-fold: exact same function, full-MXU-lane contraction
            # (see use_fold; benchmarks/conv_experiments.json)
            b, h, wd, c = x.shape
            wf = _width_fold_kernel(jnp.transpose(w, (2, 3, 1, 0)),
                                    self.padding)
            pw = 0 if self.padding == 0 else (k // 2 + 1) // 2
            y = lax.conv_general_dilated(
                x.reshape(b, h, wd // 2, 2 * c), wf,
                window_strides=(1, 1),
                padding=((self.padding, self.padding), (pw, pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y.reshape(y.shape[0], y.shape[1], 2 * y.shape[2],
                          self.out_channels)
        else:
            if _LAYOUT == "NHWC":
                wl = jnp.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
                dn = ("NHWC", "HWIO", "NHWC")
            else:
                wl = w
                dn = ("NCHW", "OIHW", "NCHW")
            y = lax.conv_general_dilated(
                x, wl,
                window_strides=(self.stride, self.stride),
                padding=((self.padding, self.padding),
                         (self.padding, self.padding)),
                dimension_numbers=dn,
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            b = b.astype(x.dtype)
            y = y + (b if _LAYOUT == "NHWC" else b[None, :, None, None])
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
        w_t = w_t.astype(x.dtype)
        if _LAYOUT == "NHWC":
            w_t = jnp.transpose(w_t, (2, 3, 1, 0))  # OIHW -> HWIO
            dn = ("NHWC", "HWIO", "NHWC")
        else:
            dn = ("NCHW", "OIHW", "NCHW")
        lo = k - 1 - self.padding
        hi = k - 1 - self.padding + self.output_padding
        y = lax.conv_general_dilated(
            x, w_t,
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=dn,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            b = b.astype(x.dtype)
            y = y + (b if _LAYOUT == "NHWC" else b[None, :, None, None])
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
        red = (0, 2, 3) if _LAYOUT == "NCHW" else (0, 1, 2)
        C = self.num_features
        # persistent fold region (use_fold("region")): input is
        # width-folded, channel i<C is column-phase 0 of channel i,
        # channel C+i phase 1.  Per-channel statistics over (N,H,W)
        # are recovered EXACTLY by pooling the two phase halves
        # (equal counts): mean = (m0+m1)/2, var = (v0+v1)/2 +
        # ((m0-m1)/2)^2 — so a folded chain computes the identical
        # function with no unfold relayout.
        folded = (_FOLD in _REGION_MODES and _LAYOUT == "NHWC"
                  and x.ndim == 4 and x.shape[-1] == 2 * C)

        def pool_phases(mean, var):
            m0, m1 = mean[..., :C], mean[..., C:]
            v0, v1 = var[..., :C], var[..., C:]
            return (0.5 * (m0 + m1),
                    0.5 * (v0 + v1) + 0.25 * jnp.square(m0 - m1))

        def tile(v):
            return jnp.concatenate([v, v], axis=-1) if folded else v

        s = _STREAMS if train else 1
        if train and s > 1:
            # Stream-batched call: stats per stream (see use_streams).
            # The 5-D view exists only under the (small-output) stat
            # reductions; normalization stays 4-D with per-sample (N,C)
            # stats — a 5-D normalize costs XLA a re-laid-out copy of
            # the activation (measured: OOM at b16-bf16).
            if x.shape[0] % s:
                raise ValueError(
                    f"batch {x.shape[0]} not divisible by {s} streams")
            per = x.shape[0] // s
            xs = x.reshape((s, per) + x.shape[1:])
            sred = tuple(a + 1 for a in red)
            x32 = xs.astype(jnp.float32)
            mean = jnp.mean(x32, axis=sred)        # (s, C) [(s, 2C) folded]
            var = jnp.var(x32, axis=sred)
            n = xs.shape[sred[0]] * xs.shape[sred[1]] * xs.shape[sred[2]]
            if folded:
                mean, var = pool_phases(mean, var)
                n *= 2
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                rm, rv = ra_mean.value, ra_var.value
                for i in range(s):  # sequential, reference call order
                    rm = (1 - self.momentum) * rm + self.momentum * mean[i]
                    rv = (1 - self.momentum) * rv + self.momentum * unbiased[i]
                ra_mean.value, ra_var.value = rm, rv
            inv = lax.rsqrt(var + self.eps) * scale[None]     # (s, C)
            mean_n = jnp.repeat(tile(mean), per, axis=0)      # (s*N, C|2C)
            inv_n = jnp.repeat(tile(inv), per, axis=0)
            if _LAYOUT == "NCHW":
                mean_n = mean_n[:, :, None, None]
                inv_n = inv_n[:, :, None, None]
                bias_b = bias[None, :, None, None]
            else:
                mean_n = mean_n[:, None, None, :]
                inv_n = inv_n[:, None, None, :]
                bias_b = tile(bias)[None, None, None, :]
            return (x - mean_n.astype(x.dtype)) * inv_n.astype(x.dtype) \
                + bias_b.astype(x.dtype)
        if train:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=red)
            var = jnp.var(x32, axis=red)
            n = x.shape[red[0]] * x.shape[red[1]] * x.shape[red[2]]
            if folded:
                mean, var = pool_phases(mean, var)
                n *= 2
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
        if _LAYOUT == "NCHW":
            bshape = (1, self.num_features, 1, 1)
        else:
            bshape = (1, 1, 1, 2 * C if folded else C)
        y = (x - tile(mean).reshape(bshape).astype(x.dtype)) * \
            tile(inv).reshape(bshape).astype(x.dtype) + \
            tile(bias).reshape(bshape).astype(x.dtype)
        return y
