"""Serving export: serialize the SR inference function to a portable
StableHLO artifact via ``jax.export``.

The artifact is self-contained — weights are embedded as constants and
the batch dimension is symbolic — so a serving process can run it with
``deserialize(...).call(x)`` on any batch size without importing the
model code (or torch) at all.  This replaces nothing in the reference
(it has no serving story; inference is a Python eval loop,
`/root/reference/utils.py:182-214`) — it is the production path the
TPU rebuild adds.

    from ficsr_tpu.serving import export_sr, load_sr
    blob = export_sr(variables)              # bytes
    open("sr_model.bin", "wb").write(blob)
    ...
    sr = load_sr("sr_model.bin")             # callable
    y = sr(x)                                # (N,1,H,W) -> (N,1,H,W) SR

CLI: ``python export.py --ckpt netG_A2B.pth --output sr_model.bin``.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import jax
import jax.numpy as jnp
from jax import export as jexport

from ficsr_tpu.ops.freq import RADII_A, frequency_split
from ficsr_tpu.train.state import MODELS

__all__ = ["export_sr", "load_sr", "make_infer_fn"]


def make_infer_fn(variables: dict, bf16: bool = False) -> Callable:
    """The full serving computation: frequency split (reference eval
    recipe, utils.py:202-205) + NetworkA2B in eval-BN mode, weights
    closed over (they become constants in the exported artifact)."""
    model = MODELS["a2b"]

    def fn(x):
        lf, hf = frequency_split(x, *RADII_A)
        if bf16:
            lf, hf = lf.astype(jnp.bfloat16), hf.astype(jnp.bfloat16)
        out, _ = model.apply(variables, lf, hf, train=False,
                             mutable=["batch_stats"])
        return out[2].astype(jnp.float32)

    return fn


def export_sr(variables: dict, size: int = 256, bf16: bool = False,
              platforms: Union[Sequence[str], None] = None) -> bytes:
    """Serialize SR inference to bytes (StableHLO + embedded weights).

    The batch dimension is symbolic ("b"): one artifact serves any
    batch size.  `platforms` defaults to the current backend; pass e.g.
    ("tpu", "cpu") for a multi-platform artifact.
    """
    fn = make_infer_fn(variables, bf16=bf16)
    b = jexport.symbolic_shape("b")[0]
    spec = jax.ShapeDtypeStruct((b, 1, size, size), jnp.float32)
    exported = jexport.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms else None,
    )(spec)
    return exported.serialize()


def load_sr(path_or_bytes) -> Callable:
    """Load a serialized artifact; returns `f(x: (N,1,H,W) float32)`."""
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as fh:
            blob = fh.read()
    exported = jexport.deserialize(blob)
    return lambda x: exported.call(x)
