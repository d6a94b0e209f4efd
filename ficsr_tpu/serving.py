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

__all__ = ["export_sr", "load_sr", "export_sr_compiled",
           "load_sr_compiled", "make_infer_fn", "make_sharded_infer_fn"]


def make_infer_fn(variables: dict, bf16: bool = False,
                  conv_fold: str = "auto") -> Callable:
    """The full serving computation: frequency split (reference eval
    recipe, utils.py:202-205) + NetworkA2B in eval-BN mode, weights
    closed over (they become constants in the exported artifact).
    `conv_fold` (resolve_conv_fold_infer) traces the exact-equivalent
    persistent-fold-region convs into the artifact when active."""
    from ficsr_tpu.models.layers import use_fold
    from ficsr_tpu.train.config import resolve_conv_fold_infer

    model = MODELS["a2b"]

    def fn(x):
        # batch may be symbolic (export_sr's "b") — resolve_conv_fold_infer
        # treats a non-int batch as None and 'auto' falls back to off
        b = x.shape[0]
        fold = resolve_conv_fold_infer(
            conv_fold, batch=b if isinstance(b, int) else None)
        lf, hf = frequency_split(x, *RADII_A)
        if bf16:
            lf, hf = lf.astype(jnp.bfloat16), hf.astype(jnp.bfloat16)
        with use_fold(fold):
            out, _ = model.apply(variables, lf, hf, train=False,
                                 mutable=["batch_stats"])
        return out[2].astype(jnp.float32)

    return fn


def make_sharded_infer_fn(variables: dict, mesh=None, bf16: bool = False,
                          conv_fold: str = "auto", axis: str = "data"
                          ) -> Callable:
    """Multi-chip DP serving: the same computation as `make_infer_fn`,
    jitted over a 1-D device mesh with the batch sharded on the data
    axis and weights replicated.  Per-image SR is embarrassingly
    parallel — XLA inserts zero collectives, so throughput scales
    linearly with chips over ICI (each chip runs the single-chip
    headline program on batch/n images).

    The batch must be divisible by the mesh size unless ``pad=True``,
    which edge-replicates the batch up to the next multiple and slices
    the padded rows back off (exact: eval-BN SR is per-image, so pad
    rows cannot leak into real outputs — the same trick as the eval
    chunking in train/evaluate.py).  Beyond-reference capability: the
    reference serves from a single-GPU Python loop
    (`/root/reference/utils.py:182-214`).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ficsr_tpu.parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh(axis=axis)
    fn = make_infer_fn(variables, bf16=bf16, conv_fold=conv_fold)
    dp = NamedSharding(mesh, P(axis))
    jfn = jax.jit(fn, in_shardings=dp, out_shardings=dp)
    n = mesh.devices.size

    def sharded(x, pad: bool = False):
        b = x.shape[0]
        if b % n:
            if not pad:
                raise ValueError(
                    f"batch {b} not divisible by mesh size {n}; pass "
                    "pad=True or pad the batch yourself")
            extra = -b % n
            x = jnp.concatenate(
                [x, jnp.repeat(x[-1:], extra, axis=0)], axis=0)
            return jfn(x)[:b]
        return jfn(x)

    return sharded


def export_sr(variables: dict, size: int = 256, bf16: bool = False,
              platforms: Union[Sequence[str], None] = None,
              conv_fold: str = "auto") -> bytes:
    """Serialize SR inference to bytes (StableHLO + embedded weights).

    The batch dimension is symbolic ("b"): one artifact serves any
    batch size.  `platforms` defaults to the current backend; pass e.g.
    ("tpu", "cpu") for a multi-platform artifact.
    """
    fn = make_infer_fn(variables, bf16=bf16, conv_fold=conv_fold)
    b = jexport.symbolic_shape("b")[0]
    spec = jax.ShapeDtypeStruct((b, 1, size, size), jnp.float32)
    exported = jexport.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms else None,
    )(spec)
    return exported.serialize()


def load_sr(path_or_bytes) -> Callable:
    """Load a serialized artifact; returns `f(x: (N,1,H,W) float32)`.

    NOTE (measured, r3; bisected r4): on the tunneled axon TPU runtime
    the spliced `call_module` this produces executes ~400x slower than
    the natively jitted function (b1: 225-810 ms across runs vs 2.1 ms
    — benchmarks/serving_latency.json).  benchmarks/stablehlo_probe.py
    pins it on call_module splicing generally — a deserialized
    Exported runs ~11x slow even for a 2-matmul concrete-shape repro,
    symbolic batch dims are NOT the cause.  On CPU and standard TPU
    runtimes it compiles into the outer program normally.  For
    same-platform production serving use the AOT-compiled artifact
    below, which preserves the fully optimized executable.
    """
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as fh:
            blob = fh.read()
    exported = jexport.deserialize(blob)
    return lambda x: exported.call(x)


def export_sr_compiled(variables: dict, size: int = 256, batch: int = 1,
                       bf16: bool = False, conv_fold: str = "auto") -> bytes:
    """AOT-compile SR inference and serialize the *compiled executable*
    (jax.experimental.serialize_executable).

    Unlike the StableHLO artifact this is same-platform/same-topology
    and fixed-batch, but it ships XLA's fully optimized binary — zero
    compile at load time and native-jit performance.  Export one blob
    per serving shape (e.g. batch=1 for latency, batch=128 for the
    throughput sweet spot on v5e).
    """
    import pickle

    from jax.experimental import serialize_executable as se

    fn = make_infer_fn(variables, bf16=bf16, conv_fold=conv_fold)
    # pin the executable to ONE device: on multi-device hosts an
    # unpinned lowering round-trips through deserialize expecting
    # device_count shards for single-device arrays
    dev = jax.devices()[0]
    sharding = jax.sharding.SingleDeviceSharding(dev)
    spec = jax.ShapeDtypeStruct((batch, 1, size, size), jnp.float32,
                                sharding=sharding)
    compiled = jax.jit(fn).lower(spec).compile()
    payload, in_tree, out_tree = se.serialize(compiled)
    return pickle.dumps(
        {"payload": payload, "in_tree": in_tree, "out_tree": out_tree,
         "batch": batch, "size": size})


def load_sr_compiled(path_or_bytes) -> Callable:
    """Load an `export_sr_compiled` blob; returns the compiled callable
    (input shape fixed to the exported (batch, 1, size, size))."""
    import pickle

    from jax.experimental import serialize_executable as se

    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as fh:
            blob = fh.read()
    d = pickle.loads(blob)
    # execution_devices defaults to ALL local devices, which mismatches
    # the single-device executable on multi-device hosts — pin device 0
    return se.deserialize_and_load(d["payload"], d["in_tree"],
                                   d["out_tree"],
                                   execution_devices=[jax.devices()[0]])
