#!/usr/bin/env python3
"""Mosaic capability probes for the im2col conv kernel (round 2).

Round 1's Pallas im2col conv failed on two Mosaic limits (see
ficsr_tpu/ops/pallas_conv.py): the halo DMA needs a 128-aligned lane
dim (C=64 is not), and lane-splitting reshapes were unsupported.  This
script probes, on the current jax/Mosaic, each candidate building
block in isolation (tiny shapes, one compile each):

  P1  in-kernel lane-split reshape  (th, W*C) -> (th, W, C)
  P2  manual DMA of a 3-D HBM slab with lane dim 64
  P3  flattened-lane DMA (aligned) + reshape + 9 accumulated dots
      == the full conv kernel building block

Run: python benchmarks/mosaic_probes.py
"""

import functools
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                print(f"{name}: OK", flush=True)
            except Exception as e:
                lines = [ln for ln in str(e).split("\n")
                         if ("Mosaic failed" in ln or "tpu." in ln
                             or "unsupported" in ln.lower()
                             or "not implemented" in ln.lower()
                             or "NotImplemented" in ln)]
                msg = " | ".join(lines[:4])[:700] or str(e)[-400:]
                print(f"{name}: FAIL — {msg}", flush=True)
        return run
    return deco


@probe("P1 lane-split reshape")
def p1():
    def kernel(x_ref, o_ref):
        v = x_ref[:]                     # (8, 256*64)
        v3 = v.reshape(8, 256, 64)       # lane-splitting reshape
        o_ref[:] = jnp.sum(v3, axis=2)

    x = jnp.ones((8, 256 * 64), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert float(out[0, 0]) == 64.0


@probe("P2 3-D slab DMA lane=64")
def p2():
    def kernel(x_hbm, o_ref, slab, sem):
        dma = pltpu.make_async_copy(x_hbm.at[0, pl.ds(0, 10)], slab, sem)
        dma.start()
        dma.wait()
        o_ref[:] = jnp.sum(slab[:], axis=(0,))

    x = jnp.ones((2, 16, 64, 64), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((10, 64, 64), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x)
    assert float(out[0, 0]) == 10.0


@probe("P3 flat DMA + reshape + 9-tap dots")
def p3():
    th, w, c, co = 6, 256, 64, 64

    def kernel(x_hbm, w_ref, o_ref, slab, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(0, th + 2)], slab, sem)
        dma.start()
        dma.wait()
        v = slab[:].reshape(th + 2, w + 2, c)
        acc = None
        for dy in range(3):
            for dx in range(3):
                s = v[dy:dy + th, dx:dx + w, :]
                part = jax.lax.dot_general(
                    s, w_ref[3 * dy + dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        o_ref[0] = acc.astype(o_ref.dtype)

    x = jnp.ones((1, 12 + 2, (w + 2) * c), jnp.bfloat16)
    wts = jnp.full((9, c, co), 0.01, jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(1, 2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w, co), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 12, w, co), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((th + 2, (w + 2) * c), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x, wts)
    assert abs(float(out[0, 0, 5, 0]) - 9 * 64 * 0.01) < 0.1


def versions() -> str:
    """jax/jaxlib/libtpu versions — print with every probe run so BACKLOG
    records exactly which toolchain each pass/fail belongs to."""
    import importlib.metadata as md
    parts = [f"jax={jax.__version__}"]
    for pkg in ("jaxlib", "libtpu", "libtpu-nightly"):
        try:
            parts.append(f"{pkg}={md.version(pkg)}")
        except md.PackageNotFoundError:
            pass
    try:
        parts.append(
            "platform_version=" + jax.devices()[0].client.platform_version)
    except Exception:
        pass
    return " ".join(parts)


if __name__ == "__main__":
    print(f"# {versions()}", flush=True)
    for p in (p1, p2, p3):
        p()
