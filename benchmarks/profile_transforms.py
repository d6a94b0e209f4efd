"""Wavelet-transform microbenchmarks (mirrors the reference profiling
kit: `pytorch_wavelets/tests/profile.py` — axes: transform, J, batch,
size, fwd/inv/grad — with jax.profiler traces instead of nvprof).

Usage:
  python benchmarks/profile_transforms.py dwt --j 3 --size 256 --batch 10
  python benchmarks/profile_transforms.py swt --grad
  python benchmarks/profile_transforms.py all            # summary table
  # the reference's published headline configs:
  python benchmarks/profile_transforms.py dtcwt --j 1 --batch 10 \
      --channels 10 --size 128          # speed.rst: 3.7 ms GTX1080
  python benchmarks/profile_transforms.py scat --batch 128 --channels 3 \
      --size 256 --grad                 # scatternet.rst: 0.10/0.16 s
  ... add --trace DIR to capture a jax.profiler trace for xprof.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp


def _time(fn, x, iters=20):
    """Honest device sync — see benchmarks/timing.py (shared helper)."""
    from timing import honest_ms, tree_acc

    @jax.jit
    def step(v, acc):
        return acc + tree_acc(fn(v))

    return honest_ms(step, (x,), iters)


def bench_one(kind: str, j: int, size: int, batch: int, wave: str,
              mode: str, grad: bool, iters: int, channels: int = 1):
    from ficsr_tpu.wavelets import wavedec2, waverec2
    from ficsr_tpu.wavelets.swt import iswt2, swt2

    x = jax.random.normal(jax.random.PRNGKey(0),
                          (batch, channels, size, size))
    if kind == "dwt":
        fwd = jax.jit(lambda v: wavedec2(v, wave, mode, j))
        coeffs = fwd(x)
        inv = jax.jit(lambda c: waverec2(c, wave, mode))
        loss = jax.jit(jax.grad(
            lambda v: sum(jnp.sum(t ** 2) for t in
                          jax.tree.leaves(wavedec2(v, wave, mode, j)))))
    elif kind == "swt":
        fwd = jax.jit(lambda v: swt2(v, wave, j))
        coeffs = fwd(x)
        inv = jax.jit(lambda c: iswt2(c, wave))
        loss = jax.jit(jax.grad(
            lambda v: sum(jnp.sum(t ** 2) for t in swt2(v, wave, j))))
    elif kind == "dtcwt":
        # comparable to the reference's headline table
        # (`pytorch_wavelets/docs/speed.rst:7-39`: J1 fwd 3.7 ms,
        # J2 fwd 6.9 ms, J1/J2 inv 4.1/8.1 ms on a GTX1080 at 10x10x128^2)
        from ficsr_tpu.wavelets import DTCWTForward, DTCWTInverse
        fm, im = DTCWTForward(J=j), DTCWTInverse()
        fwd = jax.jit(fm)
        coeffs = fwd(x)
        inv = jax.jit(im)
        loss = jax.jit(jax.grad(
            lambda v: sum(jnp.sum(t ** 2)
                          for t in jax.tree.leaves(fm(v)))))
    elif kind in ("scat", "scat2"):
        # comparable to `pytorch_wavelets/docs/scatternet.rst:31-42`
        # (ScatLayer fwd 0.10 s / bwd 0.16 s on GTX1080 at 128x3x256x256);
        # scat2 = 2nd-order ScatLayerj2 (49x channels out)
        from ficsr_tpu.wavelets import ScatLayer, ScatLayerj2
        sl = ScatLayer() if kind == "scat" else ScatLayerj2()
        fwd = jax.jit(sl)
        coeffs = fwd(x)
        inv = None
        loss = jax.jit(jax.grad(lambda v: jnp.sum(sl(v) ** 2)))
    else:
        raise ValueError(kind)

    rows = [("fwd", _time(fwd, x, iters))]
    if inv is not None:
        rows.append(("inv", _time(inv, coeffs, iters)))
    if grad:
        rows.append(("grad", _time(loss, x, iters)))
    filt = {"dtcwt": "near_sym_a/qshift_a",
            "scat": "near_sym_a",
            "scat2": "near_sym_a/qshift_a"}.get(kind, wave)
    for name, ms in rows:
        print(f"{kind} {filt} J={j} {batch}x{x.shape[1]}x{size}x{size} "
              f"{name}: {ms:8.3f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind",
                   choices=["dwt", "swt", "dtcwt", "scat", "scat2", "all"])
    p.add_argument("--channels", type=int, default=1)
    p.add_argument("--j", type=int, default=1)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--wave", default="db4")
    p.add_argument("--mode", default="reflect")
    p.add_argument("--grad", action="store_true")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace", default="")
    args = p.parse_args()

    def run():
        if args.kind == "all":
            for kind in ("dwt", "swt", "dtcwt"):
                for j in (1, 2):
                    bench_one(kind, j, args.size, args.batch, args.wave,
                              args.mode, args.grad, args.iters,
                              args.channels)
        else:
            bench_one(args.kind, args.j, args.size, args.batch, args.wave,
                      args.mode, args.grad, args.iters, args.channels)

    if args.trace:
        with jax.profiler.trace(args.trace):
            run()
        print(f"trace written to {args.trace}")
    else:
        run()


if __name__ == "__main__":
    main()
