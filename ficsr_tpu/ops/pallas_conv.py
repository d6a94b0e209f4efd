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

STATUS: EXPERIMENTAL, measured dead end (r4) — correct in interpret
mode (parity 3e-6 vs the XLA conv) but every TPU formulation loses:
  1. THIS kernel cannot compile for C=64 (Mosaic: 9-way lane concat
     fails; halo DMA needs a 128-aligned lane dim) — r1/r3 findings,
     re-probed each round by benchmarks/mosaic_probes.py P1-P3.
  2. The packed-128 geometry (channels of columns x,x+1 share one
     128-lane block) DOES compile — mosaic_probes P4, r4 — but
     measures 0.83x the XLA conv naive and 0.52-0.54x double-buffered
     (benchmarks/pallas_conv_v2.py: sublane-offset tap slices cost
     VPU shifts; the 64-wide dot output half-fills the MXU; the
     fused 128-wide-output variant exceeds scoped VMEM at 256^2).
  3. XLA-level im2col loses too: pad-slice-concat patches + one
     (.,576)x(576,64) matmul = 3.07 ms, conv_general_dilated_patches
     = 4.49 ms, vs 1.70 ms for XLA's native conv (fwd b8 256^2 bf16).
Conclusion (after P4/v2a/v2b/XLA-im2col x2/int8/ConvT-subpixel all
measured): XLA's native conv lowering stands on this shape class; the
adopted win for the step is the fold-region formulation
(models/layers.use_fold).  On TPU this function raises — it exists as
the executable spec of the im2col formulation for interpret-mode
parity tests; set FICSR_EXPERIMENTAL_PALLAS_CONV=1 to try compiling
anyway on a newer Mosaic.
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
    import os
    if jax.default_backend() == "tpu" and not os.environ.get(
            "FICSR_EXPERIMENTAL_PALLAS_CONV"):
        raise NotImplementedError(
            "conv3x3_im2col cannot compile on this Mosaic for C=64 and "
            "every compilable variant measured slower than the XLA conv "
            "(see module docstring / benchmarks/pallas_conv_v2.py). "
            "Set FICSR_EXPERIMENTAL_PALLAS_CONV=1 to try anyway.")
    n, c, h, ww = x.shape
    cout = w.shape[0]
    xh = jnp.transpose(x, (0, 2, 3, 1))
    # (Cout, Cin, 3, 3) -> (9, Cin, Cout) matching tap order (dy, dx)
    wm = jnp.transpose(w, (2, 3, 1, 0)).reshape(9, c, cout)
    y = _conv_nhwc(xh, wm.astype(x.dtype), th)
    return jnp.transpose(y, (0, 3, 1, 2))
