#!/usr/bin/env python3
"""Per-conv-class formulation experiments on the real TPU (honest sync).

The train step's FLOP budget (b16) is dominated by four conv classes
(reference shapes from model.py:423-442 shallowNet / 444-480 resnet):

  A. 3x3  64->64  @256^2  (shallow_up ResBlocks, 6 convs/forward)
  B. 3x3 256->256 @ 32^2  (resnet ResBlocks, 16 convs/forward)
  C. 7x7  64->64  @128^2  (resnet stem+head)
  D. ConvT 4x4 s2 128->64 @128->256 (shallow_up proj)

For each class this script times candidate formulations in bf16 at
batch 16 (the BENCH train config) with the device-accumulator sync
(block_until_ready is a no-op on axon — benchmarks/README.md):

  - nchw:    lax.conv NCHW/OIHW (current model layout)
  - nhwc:    lax.conv NHWC/HWIO
  - im2col:  9 shifted slices concat -> one (M,9C)x(9C,Co) dot  [A only]
  - pad128:  zero-pad channels 64->128 (4x FLOPs, full MXU lanes) [A only]

plus fwd+bwd (grad wrt x and w) for the top contenders, since the
backward pass has its own conv shapes (transposed/dilated).

Usage: python benchmarks/conv_experiments.py [--iters 30]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

B = 16
DT = jnp.bfloat16


from timing import honest_ms


def honest_time(fn, args, iters):
    return honest_ms(fn, args, iters) / 1e3  # seconds (callers expect s)


def conv_nchw(x, w, stride=1, pad=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def conv_nhwc(x, w, stride=1, pad=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_fwd(conv, x, w, **kw):
    @jax.jit
    def f(x, w, acc):
        y = conv(x, w, **kw)
        return acc + jnp.mean(y.astype(jnp.float32))
    return f, (x, w)


def make_fwdbwd(conv, x, w, **kw):
    # squared loss: the cotangent 2y/N depends on y, so XLA cannot
    # const-fold the backward convs (a plain mean's cotangent is a
    # constant and the bwd pass folds to weight/input sums — measured
    # 47 "TF/s" artifacts before this fix)
    def loss(x, w):
        return jnp.mean(jnp.square(conv(x, w, **kw).astype(jnp.float32)))

    @jax.jit
    def f(x, w, acc):
        v, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
        return (acc + v + jnp.mean(gx.astype(jnp.float32))
                + jnp.mean(gw.astype(jnp.float32)))
    return f, (x, w)


def im2col_conv(x, w):
    """x: (B,H,W,C) pre-padded by caller? No — pads here. w: (9C, Co)."""
    b, h, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + ww, :] for dy in range(3) for dx in range(3)],
        axis=-1)  # (B,H,W,9C)
    return jnp.einsum("bhwk,ko->bhwo", cols, w)


# ---------------------------------------------------------------------------
# Space-to-depth (width-fold) reformulations — round 3 (VERDICT item 1).
#
# Key fact: in NHWC row-major memory, (B,H,W,C) -> (B,H,W/r,r*C) is a PURE
# RESHAPE (flat index w*C+c == w2*(r*C) + dx*C + c with w = r*w2+dx), so
# folding width-pairs into channels costs zero data movement.  A stride-1
# odd-k conv on the fine grid is then *exactly* a conv on the folded grid
# with a zero-structured kernel: output phase q (fine col r*j+q), tap
# offset kx-m lands on fine col f = q+kx-m = r*u+p, i.e. coarse offset
# u = floor(f/r), input phase p = f mod r.  For r=2, k=3 the coarse kernel
# is 3x3 x 2C x 2Co with half the entries zero: 2x the FLOPs of the fine
# conv, but the contraction depth is 2C=128 = full MXU lanes (the 64-ch
# class half-fills them — the measured ~3x train-step MFU gap).
# ---------------------------------------------------------------------------


def fold_kernel_w(w, r):
    """HWIO fine kernel (kh,kw,C,Co), kw odd -> folded (kh,kwc,r*C,r*Co)."""
    kh, kw, c, co = w.shape
    m = kw // 2
    hw = (m + r - 1) // r  # coarse half-width: covers u=floor((q+-m)/r)
    kwc = 2 * hw + 1
    wf = jnp.zeros((kh, kwc, r * c, r * co), w.dtype)
    for q in range(r):
        for kx in range(kw):
            f = q + kx - m
            u = f // r + hw
            p = f % r
            wf = wf.at[:, u, p * c:(p + 1) * c, q * co:(q + 1) * co].set(
                w[:, kx])
    return wf


def conv_s2dw(x, w, r=2):
    """Exact stride-1 'same' conv via width-fold by r. x NHWC, w HWIO."""
    b, h, wd, c = x.shape
    kh, kw, _, co = w.shape
    xf = x.reshape(b, h, wd // r, r * c)
    wf = fold_kernel_w(w, r)
    hw = (kw // 2 + r - 1) // r
    y = lax.conv_general_dilated(
        xf, wf, (1, 1), ((kh // 2, kh // 2), (hw, hw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, h, wd, co)


def conv_s2dw_2c(x, w):
    """Width-fold r=2, k=3, as TWO exact-coverage convs (1.33x FLOPs,
    K=2C=128 contraction, but Co=64 output lanes + an output interleave)."""
    b, h, wd, c = x.shape
    _, _, _, co = w.shape
    xf = x.reshape(b, h, wd // 2, 2 * c)
    w0 = jnp.zeros((3, 2, 2 * c, co), w.dtype)  # phase 0: coarse taps {-1,0}
    w1 = jnp.zeros((3, 2, 2 * c, co), w.dtype)  # phase 1: coarse taps {0,+1}
    for kx in range(3):
        f0 = kx - 1
        w0 = w0.at[:, f0 // 2 + 1, (f0 % 2) * c:(f0 % 2 + 1) * c, :].set(
            w[:, kx])
        f1 = kx
        w1 = w1.at[:, f1 // 2, (f1 % 2) * c:(f1 % 2 + 1) * c, :].set(
            w[:, kx])
    dn = ("NHWC", "HWIO", "NHWC")
    y0 = lax.conv_general_dilated(xf, w0, (1, 1), ((1, 1), (1, 0)),
                                  dimension_numbers=dn)
    y1 = lax.conv_general_dilated(xf, w1, (1, 1), ((1, 1), (0, 1)),
                                  dimension_numbers=dn)
    return jnp.stack([y0, y1], axis=3).reshape(b, h, wd, co)


def conv_shift9(x, w, acc_f32=False):
    """3x3 stride-1 'same' conv as 9 shifted (M,C)x(C,Co) matmuls.

    x NHWC, w HWIO.  Zero FLOP redundancy; every partial product is a
    dense dot_general with contraction depth C — for the 256-channel
    class this turns the conv into nine MXU-shaped 16384x256x256
    matmuls instead of whatever XLA's conv emitter picks (measured
    19 TF/s fwd on class B).  Boundary taps are handled by one zero-pad
    of the input; bf16 partials accumulate in fp32 when acc_f32.
    """
    b, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc_dt = jnp.float32 if acc_f32 else x.dtype
    y = jnp.zeros((b, h, wd, co), acc_dt)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + h, dx:dx + wd, :]
            y = y + jax.lax.dot_general(
                xs, w[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=acc_dt)
    return y.astype(x.dtype)


def convt_subpixel(x, w):
    """Exact subpixel reformulation of ``convt_nhwc`` (4x4, stride 2).

    x NHWC, w HWIO (4,4,C,Co).  ConvT with lhs_dilation feeds the MXU a
    75%-zeros dilated input; but each output PHASE (py,px in {0,1}^2)
    only ever sees a fixed 2x2 subset of the 4x4 kernel, so the whole
    op is one dense 2x2 conv at the LR grid producing 4*Co phase
    channels, followed by a depth-to-space interleave:

      y[2j+p] = x[j-1]*w[2*0+p] + x[j]*w[2*1+p]        (per axis)

    i.e. K[ty,tx,ci,(py,px,o)] = w[2*ty+py, 2*tx+px, ci, o].  Same
    useful FLOPs, zero wasted ones, contraction depth C stays dense.
    Matches convt_nhwc on its full 255^2 output (our extra 256th
    row/col is the phase-1 tail the (2,1) pad clips).
    """
    b, h, wd, c = x.shape
    co = w.shape[-1]
    k2 = w.reshape(2, 2, 2, 2, c, co)            # [ty,py,tx,px,ci,o]
    k2 = k2.transpose(0, 2, 4, 1, 3, 5).reshape(2, 2, c, 4 * co)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = lax.conv_general_dilated(
        xp, k2, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (b,h+1,wd+1,4co)
    parts = out.reshape(b, h + 1, wd + 1, 2, 2, co)
    row0 = jnp.stack([parts[:, 0:h, 0:wd, 0, 0],
                      parts[:, 0:h, 1:wd + 1, 0, 1]], axis=3)
    row1 = jnp.stack([parts[:, 1:h + 1, 0:wd, 1, 0],
                      parts[:, 1:h + 1, 1:wd + 1, 1, 1]], axis=3)
    rows = jnp.stack([row0, row1], axis=2)       # (b,h,2,wd,2,co)
    return rows.reshape(b, 2 * h, 2 * wd, co)


def check_s2dw():
    """f32 equivalence of every folded variant vs the plain conv."""
    import numpy as np
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (2, 16, 24, 64), jnp.float32)
    w3 = jax.random.normal(k, (3, 3, 64, 32), jnp.float32) * 0.1
    ref = conv_nhwc(x, w3, pad=1)
    # pin this file's generalized fold_kernel_w (any r) to the
    # production r=2 kernel builder so the recorded s2dw rows cannot
    # silently drift from what the model actually runs
    from ficsr_tpu.models.layers import _width_fold_kernel
    np.testing.assert_allclose(fold_kernel_w(w3, 2),
                               _width_fold_kernel(w3, 1), atol=0)
    np.testing.assert_allclose(conv_shift9(x, w3), ref, atol=2e-4)
    np.testing.assert_allclose(conv_shift9(x, w3, acc_f32=True), ref,
                               atol=2e-4)
    np.testing.assert_allclose(conv_s2dw(x, w3, 2), ref, atol=2e-4)
    np.testing.assert_allclose(conv_s2dw(x, w3, 4), ref, atol=2e-4)
    np.testing.assert_allclose(conv_s2dw_2c(x, w3), ref, atol=2e-4)
    w7 = jax.random.normal(k, (7, 7, 64, 32), jnp.float32) * 0.1
    ref7 = conv_nhwc(x, w7, pad=3)
    np.testing.assert_allclose(conv_s2dw(x, w7, 2), ref7, atol=1e-3)
    # convT subpixel vs the lhs-dilated form (valid on the latter's
    # (2H-1)^2 output; subpixel also emits the clipped phase-1 tail)
    wt = jax.random.normal(k, (4, 4, 64, 32), jnp.float32) * 0.1
    reft = lax.conv_general_dilated(
        x, wt, (1, 1), ((2, 1), (2, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    sub = convt_subpixel(x, wt)
    np.testing.assert_allclose(sub[:, :reft.shape[1], :reft.shape[2]],
                               reft, atol=2e-4)
    print("# s2dw equivalence checks passed", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--fresh", action="store_true",
                    help="re-measure everything, ignoring the committed "
                         "conv_experiments.json cache")
    ap.add_argument("--check", action="store_true",
                    help="run f32 equivalence checks for the s2d variants "
                         "first")
    args = ap.parse_args()
    if args.check:
        check_s2dw()
    it = args.iters
    key = jax.random.PRNGKey(0)
    results = {}

    def flops_conv(bsz, h, w, kh, kw, ci, co):
        return 2 * bsz * h * w * kh * kw * ci * co

    out = os.path.join(os.path.dirname(__file__), "conv_experiments.json")
    if os.path.isfile(out) and not args.fresh:
        # resume: skip already-measured variants (crash-resumable on the
        # slow remote-compile tunnel).  NOTE: with the committed JSON in
        # place this skips EVERYTHING — pass --fresh to actually
        # re-measure (e.g. on new hardware or a new JAX release).
        with open(out) as fh:
            results.update(json.load(fh))
        if results:
            print(f"# {len(results)} cached entries loaded from {out}; "
                  "pass --fresh to re-measure", flush=True)

    def record(name, fn_args, fl):
        if name in results:
            return
        dt = honest_time(*fn_args, it)
        results[name] = {"ms": round(dt * 1e3, 3),
                         "tflops": round(fl / dt / 1e12, 1)}
        print(f"{name:34s} {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TF/s",
              flush=True)
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)

    # ---- class A: 3x3 64->64 @256^2 ----
    xA = jax.random.normal(key, (B, 64, 256, 256), DT)
    wA = jax.random.normal(key, (64, 64, 3, 3), DT) * 0.05
    flA = flops_conv(B, 256, 256, 3, 3, 64, 64)
    f, a = make_fwd(conv_nchw, xA, wA)
    record("A.3x3_64_256 nchw fwd", (f, a), flA)
    xAh = jnp.transpose(xA, (0, 2, 3, 1))
    wAh = jnp.transpose(wA, (2, 3, 1, 0))
    f, a = make_fwd(conv_nhwc, xAh, wAh)
    record("A.3x3_64_256 nhwc fwd", (f, a), flA)
    wAc = jnp.transpose(wA, (2, 3, 1, 0)).reshape(9 * 64, 64)
    f, a = make_fwd(im2col_conv, xAh, wAc)
    record("A.3x3_64_256 im2col fwd", (f, a), flA)
    # pad128: 128->128 conv whose extra channels are zero
    xAp = jnp.pad(xAh, ((0, 0), (0, 0), (0, 0), (0, 64)))
    wAp = jnp.pad(wAh, ((0, 0), (0, 0), (0, 64), (0, 64)))
    f, a = make_fwd(conv_nhwc, xAp, wAp)
    record("A.3x3_64_256 pad128-nhwc fwd", (f, a), flA)

    f, a = make_fwdbwd(conv_nchw, xA, wA)
    record("A.3x3_64_256 nchw fwd+bwd", (f, a), 3 * flA)
    f, a = make_fwdbwd(conv_nhwc, xAh, wAh)
    record("A.3x3_64_256 nhwc fwd+bwd", (f, a), 3 * flA)
    f, a = make_fwdbwd(im2col_conv, xAh, wAc)
    record("A.3x3_64_256 im2col fwd+bwd", (f, a), 3 * flA)

    # ---- class A space-to-depth width-fold variants (round 3) ----
    # TF/s below are on the USEFUL (fine-conv) FLOP basis; the folded
    # formulations execute 2x (r=2), 4x (r=4), 1.33x (2c) actual FLOPs.
    f, a = make_fwd(conv_s2dw, xAh, wA.transpose(2, 3, 1, 0))
    record("A.3x3_64_256 s2dw2 fwd", (f, a), flA)
    f, a = make_fwdbwd(conv_s2dw, xAh, wA.transpose(2, 3, 1, 0))
    record("A.3x3_64_256 s2dw2 fwd+bwd", (f, a), 3 * flA)
    f, a = make_fwd(lambda x, w: conv_s2dw(x, w, 4), xAh,
                    wA.transpose(2, 3, 1, 0))
    record("A.3x3_64_256 s2dw4 fwd", (f, a), flA)
    f, a = make_fwdbwd(lambda x, w: conv_s2dw(x, w, 4), xAh,
                       wA.transpose(2, 3, 1, 0))
    record("A.3x3_64_256 s2dw4 fwd+bwd", (f, a), 3 * flA)
    f, a = make_fwd(conv_s2dw_2c, xAh, wA.transpose(2, 3, 1, 0))
    record("A.3x3_64_256 s2dw-2conv fwd", (f, a), flA)
    f, a = make_fwdbwd(conv_s2dw_2c, xAh, wA.transpose(2, 3, 1, 0))
    record("A.3x3_64_256 s2dw-2conv fwd+bwd", (f, a), 3 * flA)

    # ---- class B: 3x3 256->256 @32^2 ----
    xB = jax.random.normal(key, (B, 256, 32, 32), DT)
    wB = jax.random.normal(key, (256, 256, 3, 3), DT) * 0.02
    flB = flops_conv(B, 32, 32, 3, 3, 256, 256)
    f, a = make_fwd(conv_nchw, xB, wB)
    record("B.3x3_256_32 nchw fwd", (f, a), flB)
    xBh = jnp.transpose(xB, (0, 2, 3, 1))
    wBh = jnp.transpose(wB, (2, 3, 1, 0))
    f, a = make_fwd(conv_nhwc, xBh, wBh)
    record("B.3x3_256_32 nhwc fwd", (f, a), flB)
    f, a = make_fwdbwd(conv_nchw, xB, wB)
    record("B.3x3_256_32 nchw fwd+bwd", (f, a), 3 * flB)
    f, a = make_fwdbwd(conv_nhwc, xBh, wBh)
    record("B.3x3_256_32 nhwc fwd+bwd", (f, a), 3 * flB)
    # shift-and-add: 9 dense MXU matmuls, zero FLOP redundancy (r3c —
    # class B's conv fwd measures 19 TF/s, the worst row in this file,
    # and there are 16 of these per A2B pass x 6 passes per step)
    f, a = make_fwd(conv_shift9, xBh, wBh)
    record("B.3x3_256_32 shift9 fwd", (f, a), flB)
    f, a = make_fwdbwd(conv_shift9, xBh, wBh)
    record("B.3x3_256_32 shift9 fwd+bwd", (f, a), 3 * flB)
    f, a = make_fwd(lambda x, w: conv_shift9(x, w, acc_f32=True), xBh, wBh)
    record("B.3x3_256_32 shift9f32 fwd", (f, a), flB)
    f, a = make_fwdbwd(lambda x, w: conv_shift9(x, w, acc_f32=True),
                       xBh, wBh)
    record("B.3x3_256_32 shift9f32 fwd+bwd", (f, a), 3 * flB)
    # im2col (one 16384 x 2304 x 256 dot; lost badly on class A where
    # the patch tensor is 9x a 256^2 activation — B's is only 9x32^2)
    wBc = wBh.reshape(9 * 256, 256)
    f, a = make_fwd(im2col_conv, xBh, wBc)
    record("B.3x3_256_32 im2col fwd", (f, a), flB)
    f, a = make_fwdbwd(im2col_conv, xBh, wBc)
    record("B.3x3_256_32 im2col fwd+bwd", (f, a), 3 * flB)

    # ---- class C: 7x7 64->64 @128^2 (reflection-padded in model; plain
    # pad here — the pad is not the bottleneck) ----
    xC = jax.random.normal(key, (B, 64, 128, 128), DT)
    wC = jax.random.normal(key, (64, 64, 7, 7), DT) * 0.02
    flC = flops_conv(B, 128, 128, 7, 7, 64, 64)
    f, a = make_fwd(conv_nchw, xC, wC, pad=3)
    record("C.7x7_64_128 nchw fwd", (f, a), flC)
    xCh = jnp.transpose(xC, (0, 2, 3, 1))
    wCh = jnp.transpose(wC, (2, 3, 1, 0))
    f, a = make_fwd(conv_nhwc, xCh, wCh, pad=3)
    record("C.7x7_64_128 nhwc fwd", (f, a), flC)
    f, a = make_fwdbwd(conv_nchw, xC, wC, pad=3)
    record("C.7x7_64_128 nchw fwd+bwd", (f, a), 3 * flC)
    f, a = make_fwdbwd(conv_nhwc, xCh, wCh, pad=3)
    record("C.7x7_64_128 nhwc fwd+bwd", (f, a), 3 * flC)
    # width-fold r=2: coarse kernel 7x5, 128ch -> 1.43x actual FLOPs
    f, a = make_fwd(conv_s2dw, xCh, wCh)
    record("C.7x7_64_128 s2dw2 fwd", (f, a), flC)
    f, a = make_fwdbwd(conv_s2dw, xCh, wCh)
    record("C.7x7_64_128 s2dw2 fwd+bwd", (f, a), 3 * flC)

    # ---- class D: ConvT 4x4 s2 128->64, 128^2 -> 256^2 ----
    def convt_nchw(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((2, 1), (2, 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    def convt_nhwc(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((2, 1), (2, 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    xD = jax.random.normal(key, (B, 128, 128, 128), DT)
    wD = jax.random.normal(key, (64, 128, 4, 4), DT) * 0.02
    flD = flops_conv(B, 256, 256, 4, 4, 128, 64) // 4  # each output sees 2x2 taps avg
    f, a = make_fwd(convt_nchw, xD, wD)
    record("D.convT4x4s2 nchw fwd", (f, a), flD)
    xDh = jnp.transpose(xD, (0, 2, 3, 1))
    wDh = jnp.transpose(wD, (2, 3, 1, 0))
    f, a = make_fwd(convt_nhwc, xDh, wDh)
    record("D.convT4x4s2 nhwc fwd", (f, a), flD)
    f, a = make_fwdbwd(convt_nchw, xD, wD)
    record("D.convT4x4s2 nchw fwd+bwd", (f, a), 3 * flD)
    f, a = make_fwdbwd(convt_nhwc, xDh, wDh)
    record("D.convT4x4s2 nhwc fwd+bwd", (f, a), 3 * flD)
    # subpixel (r3c): dense 2x2 conv at the LR grid + depth-to-space —
    # no zero-dilated input.  MEASURED LOSS 3.4x fwd / 2.8x fwd+bwd
    # (5.61/10.38 ms vs 1.65/3.70): XLA's lhs-dilated emitter already
    # skips the zeros, and the 4-phase stack/interleave epilogue
    # dominates.  Kept as the recorded dead end — do not re-adopt.
    f, a = make_fwd(convt_subpixel, xDh, wDh)
    record("D.convT4x4s2 subpixel fwd", (f, a), flD)
    f, a = make_fwdbwd(convt_subpixel, xDh, wDh)
    record("D.convT4x4s2 subpixel fwd+bwd", (f, a), 3 * flD)

    # ---- persistent fold region (round 3b): the whole ShallowNet chain
    # (ConvT proj -> BN -> 3 ResBlocks -> head) plain vs use_fold("region").
    # The per-conv rows above cannot see what the region changes: BN/ReLU
    # staying fused in the folded layout and the per-conv fold/unfold
    # relayouts disappearing (that composition made per-conv fold a net
    # full-step LOSS, 518 vs 464 ms — benchmarks/README.md round 3).
    from ficsr_tpu.models.generators import ShallowNet
    from ficsr_tpu.models.layers import use_fold, use_layout

    with use_layout("NHWC"):
        net = ShallowNet(128, 1, up=True)
        xS = jax.random.normal(key, (B, 128, 128, 128), DT)
        vS = net.init(jax.random.PRNGKey(2), xS, train=True)

        def make_chain(fold):
            def loss(params, x):
                with use_layout("NHWC"), use_fold(fold):
                    y, upd = net.apply(
                        {"params": params, "batch_stats": vS["batch_stats"]},
                        x, train=True, mutable=["batch_stats"])
                # keep the running-stat update chain alive (same DCE trap
                # as step_profile's phase accounting)
                stats = sum(jnp.sum(s.astype(jnp.float32))
                            for s in jax.tree.leaves(upd))
                return jnp.mean(jnp.square(y.astype(jnp.float32))) \
                    + 1e-12 * stats

            @jax.jit
            def f(params, x, acc):
                v, (gp, gx) = jax.value_and_grad(
                    loss, argnums=(0, 1))(params, x)
                return (acc + v + jnp.mean(gx.astype(jnp.float32))
                        + sum(jnp.mean(g.astype(jnp.float32))
                              for g in jax.tree.leaves(gp)))
            return f, (vS["params"], xS)

        flS = (flops_conv(B, 256, 256, 4, 4, 128, 64) // 4
               + 6 * flops_conv(B, 256, 256, 3, 3, 64, 64)
               + flops_conv(B, 256, 256, 3, 3, 64, 1))
        f, a = make_chain(False)
        record("R.shallow_chain plain fwd+bwd", (f, a), 3 * flS)
        f, a = make_chain("region")
        record("R.shallow_chain region fwd+bwd", (f, a), 3 * flS)

        # fwd-only, eval-mode BN (the INFERENCE regime — decides whether
        # bench.py/infer.py should run the fold region; the per-conv fold
        # loses fwd-only, but the region has no per-conv boundaries)
        def make_chain_eval(fold):
            def fwd(x, acc):
                with use_layout("NHWC"), use_fold(fold):
                    y = net.apply(
                        {"params": vS["params"],
                         "batch_stats": vS["batch_stats"]},
                        x, train=False)
                return acc + jnp.mean(y.astype(jnp.float32))
            return jax.jit(fwd), (xS,)

        f, a = make_chain_eval(False)
        record("R.shallow_chain plain eval-fwd", (f, a), flS)
        f, a = make_chain_eval("region")
        record("R.shallow_chain region eval-fwd", (f, a), flS)

    print(f"wrote {out}")


if __name__ == "__main__":
    main()
