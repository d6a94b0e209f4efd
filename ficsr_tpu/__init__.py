"""ficsr_tpu — Frequency-aware Inverse-Consistent OCTA Super-Resolution, TPU-native.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
KevynUtopia/Frequency-Aware-Inverse-Consistent-OCTA-Super-Resolution
(MICCAI 2022): a CycleGAN-style unpaired super-resolution system for OCT
angiograms with FFT-based frequency splitting, dual-branch generators,
frequency-aware (DWT) discriminators, and a differentiable wavelet
transform library (reference: vendored pytorch_wavelets v1.3.0).

Everything here is designed TPU-first:
  * the whole train step (six generator forwards, both loss sets, both
    optimizer updates) is one jitted, donated-buffer function;
  * wavelet filter banks are built from `lax.conv_general_dilated`
    compositions with an analytic-adjoint custom VJP, plus a fused
    Pallas kernel for the Haar J=1 path the discriminators hit each step;
  * scaling is `jax.sharding.Mesh` + NamedSharding data parallelism.
"""

__version__ = "0.1.0"

# Lazy subpackage access (PEP 562): `ficsr_tpu.tpu_tuning.apply()` must
# be importable BEFORE jax/libtpu initialize (it sets LIBTPU_INIT_ARGS,
# read once at plugin init), so the package __init__ must not pull in
# the jax-importing subpackages eagerly.
_SUBMODULES = ("wavelets", "ops", "models", "train", "data", "parallel",
               "convert", "utils", "serving", "tpu_tuning")


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib
        return importlib.import_module(f"ficsr_tpu.{name}")
    raise AttributeError(f"module 'ficsr_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
