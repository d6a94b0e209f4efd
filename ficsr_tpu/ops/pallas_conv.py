"""Pallas im2col-matmul 3x3 convolution for MXU-starved shapes.

Honest profiling (benchmarks/README.md) shows XLA's conv lowering
reaches only ~32 TFLOP/s on the generator's dominant shape class —
3x3, stride 1, 64 in/out channels at 256^2 (the shallow_up ResBlocks):
a 64-deep contraction starves the 128x128 MXU.

This kernel rebuilds the conv as an explicit im2col matmul: each
program DMAs a haloed row-slab from HBM (overlapping windows are not
expressible with BlockSpecs, hence the manual copy), forms the
(TH*W, 9*C) patch matrix with nine shift-by-one slices (stride-1
slices are Mosaic-friendly; stride-2 is not), and runs one
(TH*W, 9C) @ (9C, Cout) MXU matmul — contraction depth 9*64 = 576
instead of 64.

Operates on NHWC with a zero-padded input (padded once in XLA); the
`conv3x3_im2col` wrapper takes/returns NCHW to match the model layout.

STATUS: EXPERIMENTAL — correct in interpret mode (parity 3e-6 vs the
XLA conv) but not yet compilable on this Mosaic version for C=64:
  1. the 9-way lane concat of shifted slices fails
     ("result/input offset mismatch on non-concat dimension") — worked
     around with 9 accumulated dot_generals;
  2. the halo'd HBM->VMEM DMA then fails twice on alignment: the slab's
     sublane dim must be 8-aligned (fixed by padding W+2 -> mult of 8)
     and its lane dim must be 128-aligned ("Slice shape along dimension
     3 must be aligned to tiling (128), but is 64") — which is exactly
     the 64-channel case this kernel targets.  Channel-padding to 128
     doubles the MAC work with zeros (no net win); a full-image block
     avoids the halo DMA but exceeds VMEM with the fp32 accumulator.
Conclusion for round 1: the XLA conv (32 TF/s on this shape) stands;
revisit when Mosaic supports sub-tile lane slicing in DMAs, or via a
(W+2)*C flattened-lane layout once lane-splitting reshapes land.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_im2col"]


def _make_kernel(th: int, w: int, cin: int, cout: int):
    # Mosaic cannot concat the 9 shifted slices along lanes (sublane
    # offset mismatch), so the im2col matmul is expressed as 9
    # accumulated dot_generals — each (th, w, cin) x (cin, cout) with
    # the shift baked into the slice; the MXU pipelines them
    # back-to-back into one fp32 accumulator.
    def kernel(x_hbm, w_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * th, th + 2)], slab, sem)
        dma.start()
        dma.wait()
        v = slab[:]                                  # (th+2, w+2, cin)
        acc = None
        k = 0
        for dy in range(3):
            for dx in range(3):
                s = v[dy:dy + th, dx:dx + w, :]
                part = jax.lax.dot_general(
                    s, w_ref[k],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                    # (th, w, cout)
                acc = part if acc is None else acc + part
                k += 1
        out_ref[0] = acc.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def _conv_nhwc(x: jnp.ndarray, w_mat: jnp.ndarray, th: int) -> jnp.ndarray:
    """x: (B, H, W, C) unpadded; w_mat: (9, C, Cout)."""
    b, h, ww, c = x.shape
    cout = w_mat.shape[-1]
    # right-pad W so the DMA slab's sublane dim (W+2) is 8-aligned
    w_pad = (-(ww + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + w_pad), (0, 0)))
    grid = (b, h // th)
    return pl.pallas_call(
        _make_kernel(th, ww, c, cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
        ],
        out_specs=pl.BlockSpec((1, th, ww, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, ww, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, ww + 2 + w_pad, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
    )(xp, w_mat)


def conv3x3_im2col(x: jnp.ndarray, w: jnp.ndarray,
                   th: int = 8) -> jnp.ndarray:
    """3x3 stride-1 pad-1 conv via im2col MXU matmul.

    x: (N, C, H, W); w: (Cout, Cin, 3, 3) torch-shaped. H must be a
    multiple of `th`. Returns (N, Cout, H, W).
    """
    n, c, h, ww = x.shape
    cout = w.shape[0]
    xh = jnp.transpose(x, (0, 2, 3, 1))
    # (Cout, Cin, 3, 3) -> (9, Cin, Cout) matching tap order (dy, dx)
    wm = jnp.transpose(w, (2, 3, 1, 0)).reshape(9, c, cout)
    y = _conv_nhwc(xh, wm.astype(x.dtype), th)
    return jnp.transpose(y, (0, 3, 1, 2))
