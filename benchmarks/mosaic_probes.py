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
import os
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


# ---------------------------------------------------------------------------
# P4 (round 4): the flattened-lane im2col attempt, VERDICT r3 next #3.
# P1 (lane-split reshape) and P2 (64-lane slab DMA) are the two Mosaic
# blockers; P4 sidesteps BOTH by changing the DMA slab geometry: pack
# the channels of columns x and x+1 into one 128-lane block
# (xpk[y, x] = [x(y, x, :64) | x(y, x+1, :64)]), so the halo slab is a
# legal tile-aligned 3-D VMEM block (lane dim 128) and the nine 64-deep
# taps become SIX accumulated 128-deep dot_generals (three full, three
# half-utilized): contraction 128 instead of 64, 1.33x MAC overhead.
# ---------------------------------------------------------------------------


def _pack128(x):
    """(N, H, W, 64) -> (N, H+2, Wp, 128) zero-padded packed halo, where
    Wp pads W+2 up to a multiple of 8 (DMA sublane alignment)."""
    n, h, w, c = x.shape
    assert c == 64
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 2), (0, 0)))
    xpk = jnp.concatenate([xpad[:, :, :w + 2], xpad[:, :, 1:w + 3]], -1)
    wp = (-(w + 2)) % 8
    return jnp.pad(xpk, ((0, 0), (0, 0), (0, wp), (0, 0)))


def _pack_weights(w9, cout, dtype):
    """(3, 3, 64, cout) taps -> (6, 128, cout): [w(dy,0); w(dy,1)] and
    [0; w(dy,2)] per row dy."""
    zeros = jnp.zeros((64, cout), dtype)
    mats = []
    for dy in range(3):
        mats.append(jnp.concatenate([w9[dy, 0], w9[dy, 1]], 0))
        mats.append(jnp.concatenate([zeros, w9[dy, 2]], 0))
    return jnp.stack(mats)


def _conv3x3_pack128(x, w9, th=8):
    """3x3 stride-1 pad-1 conv, packed-128 Pallas kernel.
    x: (N, H, W, 64) NHWC, w9: (3, 3, 64, cout).  H % th == 0."""
    n, h, w, c = x.shape
    cout = w9.shape[-1]
    xpk = _pack128(x)
    w6 = _pack_weights(w9.astype(x.dtype), cout, x.dtype)
    wp_total = xpk.shape[2]

    def kernel(x_hbm, w_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * th, th + 2)], slab, sem)
        dma.start()
        dma.wait()
        v = slab[:]                                   # (th+2, Wp, 128)
        acc = None
        for dy in range(3):
            for k, dx in enumerate((0, 1)):
                s = v[dy:dy + th, dx:dx + w, :]       # (th, W, 128)
                part = jax.lax.dot_general(
                    s, w_ref[2 * dy + k],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        out_ref[0] = acc.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 2, wp_total, 128), x.dtype),
                        pltpu.SemaphoreType.DMA],
    )(xpk, w6)


def _xla_conv3x3(x, w9):
    return jax.lax.conv_general_dilated(
        x, w9, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


@probe("P4 packed-128 halo slab + 6-tap dots")
def p4():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 24, 64), jnp.float32)
    w9 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64),
                           jnp.float32) * 0.1
    got = _conv3x3_pack128(x, w9)
    want = _xla_conv3x3(x, w9)
    err = float(jnp.abs(got - want).max())
    assert err < 2e-4, f"packed-128 conv numeric mismatch: {err}"


def time_p4(batch=8, size=256, cout=64, iters=30):
    """Measured ms on the production 3x3/64ch class (fwd, bf16 NHWC)
    vs the XLA conv — the >=1.2x gate from VERDICT r3 next #3.
    End-to-end includes the _pack128 layout cost; kernel-only excludes
    it (the bound if packing fuses into the producer)."""
    import functools
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from timing import honest_ms

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, size, size, 64), jnp.bfloat16)
    w9 = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, cout),
                            jnp.float32) * 0.1).astype(jnp.bfloat16)
    xpk = jax.jit(_pack128)(x)
    w6 = _pack_weights(w9, cout, jnp.bfloat16)

    results = {}

    @jax.jit
    def xla_fn(x, w9, acc):
        return acc + jnp.sum(_xla_conv3x3(x, w9).astype(jnp.float32))

    @jax.jit
    def pk_e2e(x, w9, acc):
        return acc + jnp.sum(_conv3x3_pack128(x, w9).astype(jnp.float32))

    results["xla_ms"] = honest_ms(xla_fn, (x, w9), iters)
    results["pack128_e2e_ms"] = honest_ms(pk_e2e, (x, w9), iters)
    # kernel-only: packed input precomputed
    n, h, w, _ = x.shape

    @jax.jit
    def pk_kernel(xpk, w6, acc):
        def kern_only(xpk, w6):
            wp_total = xpk.shape[2]
            th = 8

            def kernel(x_hbm, w_ref, out_ref, slab, sem):
                i = pl.program_id(0)
                j = pl.program_id(1)
                dma = pltpu.make_async_copy(
                    x_hbm.at[i, pl.ds(j * th, th + 2)], slab, sem)
                dma.start()
                dma.wait()
                v = slab[:]
                acc2 = None
                for dy in range(3):
                    for k, dx in enumerate((0, 1)):
                        s = v[dy:dy + th, dx:dx + w, :]
                        part = jax.lax.dot_general(
                            s, w_ref[2 * dy + k],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc2 = part if acc2 is None else acc2 + part
                out_ref[0] = acc2.astype(out_ref.dtype)

            return pl.pallas_call(
                kernel,
                grid=(n, h // th),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, th, w, cout),
                                       lambda i, j: (i, j, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, h, w, cout), xpk.dtype),
                scratch_shapes=[pltpu.VMEM((th + 2, xpk.shape[2], 128),
                                           xpk.dtype),
                                pltpu.SemaphoreType.DMA],
            )(xpk, w6)
        return acc + jnp.sum(kern_only(xpk, w6).astype(jnp.float32))

    results["pack128_kernel_ms"] = honest_ms(pk_kernel, (xpk, w6), iters)
    results["speedup_e2e"] = results["xla_ms"] / results["pack128_e2e_ms"]
    results["speedup_kernel"] = results["xla_ms"] / results["pack128_kernel_ms"]
    return results


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
    import sys as _sys
    print(f"# {versions()}", flush=True)
    for p in (p1, p2, p3, p4):
        p()
    if "--time-p4" in _sys.argv and jax.default_backend() == "tpu":
        import json as _json
        r = time_p4()
        print("P4 timing:", _json.dumps({k: round(v, 3)
                                         for k, v in r.items()}), flush=True)
