#!/usr/bin/env python3
"""Packed-128 im2col conv, round 2: pipelined DMA variants.

mosaic_probes P4 proved the packed-128 halo slab COMPILES on this
Mosaic (the r1/r3 blockers were the 64-lane DMA and the lane-split
reshape — packing channels of columns x,x+1 into one 128-lane block
sidesteps both), but the naive kernel measured 0.83x vs the XLA conv
(2.47 vs 2.05 ms, fwd b8 256^2 64ch bf16): the halo DMA runs serial
with compute and each dot's 64-wide output half-fills the MXU.

Variants here (all numerically checked against the XLA conv):
  v2a  double-buffered slab DMA over a linearized (batch x row-block)
       grid — DMA for block k+1 issued before computing block k;
       th (rows/block) swept 8/16/32.
  v2b  v2a + ONE fused dot per block: (th, W, 128) x (128, 6*64) then
       a 6-way 64-lane slice-sum — bigger MXU tile per issue, VPU adds.

Run: python benchmarks/pallas_conv_v2.py   (TPU)
Output: benchmarks/pallas_conv_v2.json
"""

import functools
import json
import os
import re
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mosaic_probes import _pack128, _pack_weights, _xla_conv3x3, versions  # noqa: E402
from timing import honest_ms  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "pallas_conv_v2.json")


def conv3x3_pack128_pipelined(x, w9, th=16, fused_dot=False):
    """x: (N, H, W, 64) NHWC; w9: (3, 3, 64, cout). H % th == 0."""
    n, h, w, c = x.shape
    cout = w9.shape[-1]
    xpk = _pack128(x)
    wp_total = xpk.shape[2]
    nb = h // th
    total = n * nb

    if fused_dot:
        # (128, 6*cout): tap order [ (dy,0|1-pack), (dy,2-half) ] x dy
        w6 = _pack_weights(w9.astype(x.dtype), cout, x.dtype)  # (6,128,cout)
        wmat = jnp.concatenate([w6[i] for i in range(6)], axis=1)
    else:
        wmat = _pack_weights(w9.astype(x.dtype), cout, x.dtype)

    def kernel(x_hbm, w_ref, out_ref, slabs, sems):
        idx = pl.program_id(0)

        def get_dma(slot, k):
            i, j = k // nb, k % nb
            return pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(j * th, th + 2)], slabs.at[slot], sems.at[slot])

        @pl.when(idx == 0)
        def _():
            get_dma(0, 0).start()

        @pl.when(idx + 1 < total)
        def _():
            get_dma((idx + 1) % 2, idx + 1).start()

        get_dma(idx % 2, idx).wait()
        v = slabs[idx % 2]                              # (th+2, Wp, 128)
        if fused_dot:
            # per (dy, dx): ONE (th, W, 128) x (128, 2*cout) dot whose
            # 128-wide output stacks two dy-rows' taps, halving the MXU
            # issues vs v2a; the final 64-lane slice-sum is VPU work
            # (sub-tile lane slicing of a VMEM VALUE — this variant IS
            # the probe for whether Mosaic accepts it)
            # pairing: for each dy, taps dx=0 and dx=1 read the same
            # slab rows v[dy:dy+th] — stack them in one dot over an
            # extended (W+1)-column slice, then slice-sum the two
            # 64-lane halves at shifted columns
            acc = None
            for dy in range(3):
                s = v[dy:dy + th, 0:w + 1, :]             # (th, W+1, 128)
                wide = jnp.concatenate(
                    [w_ref[:, 2 * dy * cout:(2 * dy + 1) * cout],
                     w_ref[:, (2 * dy + 1) * cout:(2 * dy + 2) * cout]],
                    axis=1)                               # (128, 2*cout)
                big = jax.lax.dot_general(
                    s, wide,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (th, W+1, 2c)
                t = big[:, 0:w, :cout] + big[:, 1:w + 1, cout:]
                acc = t if acc is None else acc + t
        else:
            acc = None
            for dy in range(3):
                for k, dx in enumerate((0, 1)):
                    s = v[dy:dy + th, dx:dx + w, :]
                    part = jax.lax.dot_general(
                        s, w_ref[2 * dy + k],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
        out_ref[0] = acc.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(total,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, th, w, cout), lambda k: (k // nb, k % nb, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, th + 2, wp_total, 128), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )(xpk, wmat)


def main():
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            res = json.load(fh)
    res["_versions"] = versions()

    # Runs under a raised scoped-VMEM limit (LIBTPU_INIT_ARGS=
    # --xla_tpu_scoped_vmem_limit_kib=...) record under prefixed keys so
    # they never shadow the default-limit results (v2b needs 20-82M vs
    # the 16M default — the limit is the blocker xla_flags_probe.py
    # found raisable via the LIBTPU channel).
    kp = ""
    m = re.search(r"--xla_tpu_scoped_vmem_limit_kib=(\d+)",
                  os.environ.get("LIBTPU_INIT_ARGS", ""))
    if m:
        kp = f"vmem{int(m.group(1)) // 1024}m."

    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (1, 32, 32, 64), jnp.float32)
    w9 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64),
                           jnp.float32) * 0.1

    def save():
        with open(OUT, "w") as fh:
            json.dump(res, fh, indent=1)

    # numeric checks first (fp32, tiny)
    want = _xla_conv3x3(xs, w9)
    for tag, kwargs in (("v2a", {}), ("v2b", {"fused_dot": True})):
        try:
            got = conv3x3_pack128_pipelined(xs, w9, th=8, **kwargs)
            err = float(jnp.abs(got - want).max())
            res[f"{kp}{tag}_numeric_err"] = err
            assert err < 2e-4, err
            print(f"{tag}: numeric OK ({err:.1e})", flush=True)
        except Exception as e:
            res[f"{kp}{tag}_error"] = str(e)[-600:]
            print(f"{tag}: FAIL — {str(e)[-300:]}", flush=True)
        save()

    # timing at the production shape
    x = jax.random.normal(key, (8, 256, 256, 64), jnp.bfloat16)
    w9b = w9.astype(jnp.bfloat16)

    @jax.jit
    def xla_fn(x, w, acc):
        return acc + jnp.sum(_xla_conv3x3(x, w).astype(jnp.float32))

    res[f"{kp}xla_ms"] = honest_ms(xla_fn, (x, w9b), 30)
    print(f"xla: {res[f'{kp}xla_ms']:.3f} ms", flush=True)
    save()

    for tag, kwargs in (("v2a", {}), ("v2b", {"fused_dot": True})):
        if f"{kp}{tag}_error" in res:
            continue
        for th in (8, 16, 32):
            name = f"{kp}{tag}_th{th}_ms"
            try:
                fn = jax.jit(functools.partial(
                    lambda x, w, acc, th=th, kw=kwargs: acc + jnp.sum(
                        conv3x3_pack128_pipelined(x, w, th=th, **kw)
                        .astype(jnp.float32))))
                res[name] = honest_ms(fn, (x, w9b), 30)
                res[f"{kp}{tag}_th{th}_x"] = round(
                    res[f"{kp}xla_ms"] / res[name], 3)
                print(f"{name}: {res[name]:.3f} ms "
                      f"({res[f'{kp}{tag}_th{th}_x']}x)", flush=True)
            except Exception as e:
                res[name] = None
                res[f"{kp}{tag}_th{th}_error"] = str(e)[-400:]
                print(f"{name}: FAIL — {str(e)[-200:]}", flush=True)
            save()
    print("wrote", OUT)


if __name__ == "__main__":
    main()
