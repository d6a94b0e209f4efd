"""Measured libtpu tuning defaults for the production entry points.

The axon PJRT plugin parses ``XLA_FLAGS`` client-side and rejects every
``--xla_tpu_*`` knob; the working channel for libtpu compiler flags is
``LIBTPU_INIT_ARGS`` (benchmarks/xla_flags_probe.py, 2026-08-19).

Measured on the tunneled v5e (benchmarks/xla_flags_probe.json):

  * ``--xla_tpu_scoped_vmem_limit_kib=73728`` (72 MiB scoped-VMEM
    scratch, up from the default) lets XLA form larger fusions on the
    b128 bf16 NHWC inference program: 1525.6-1527.0 vs 1427.9 img/s
    baseline (+6.9%), beating the r4 64-MiB adoption (1520.1-1520.2)
    in a same-session A/B on two separate days; train step 330.1
    ms/step (neutral-or-better vs 64's 340.7-under-load / 329.4
    quiet).  The full probed curve (r5, canary-stamped) is strongly
    non-monotone — 48/80/96 MiB each LOSE ~4% — so this value must
    not be "rounded" to a neighbor.
  * the latency-hiding scheduler is neutral single-chip (1425.9).

``apply()`` must run BEFORE the first jax/backend import in the
process — libtpu reads the env var once at plugin init.  It is a
no-op when the user already set a scoped-vmem limit themselves or
opted out via ``FICSR_NO_TPU_TUNING=1``, so explicit experiments (e.g.
xla_flags_probe subprocesses) are never overridden.
"""

import os
import sys

SCOPED_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=73728"


def apply(train: bool = False) -> bool:
    """Append the measured-best libtpu flags to LIBTPU_INIT_ARGS.

    Returns True if anything was added.  Call before importing jax.
    ``train`` is the seam for diverging the flag sets per program if a
    future probe finds a flag that wins one headline and loses the
    other; today's adopted set (72 MiB scoped-VMEM) measured +6.9% on
    inference and neutral-or-better on the train step, so both paths
    get it.
    """
    if os.environ.get("FICSR_NO_TPU_TUNING"):
        return False
    # libtpu reads LIBTPU_INIT_ARGS at PJRT plugin init (first backend
    # use), not at `import jax` — sitecustomize on some hosts imports
    # jax eagerly, so keying the warning on sys.modules would cry wolf
    # in every process.  Warn only once a backend actually exists.
    xb = sys.modules.get("jax._src.xla_bridge")
    if xb is not None and getattr(xb, "_backends", None):
        import warnings
        warnings.warn("ficsr_tpu.tpu_tuning.apply() called after a jax "
                      "backend initialized; LIBTPU_INIT_ARGS will not "
                      "take effect")
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "scoped_vmem_limit" in cur:
        return False  # user already chose a limit
    os.environ["LIBTPU_INIT_ARGS"] = (cur + " " + SCOPED_VMEM_FLAG).strip()
    return True
