"""Import shims that let the read-only reference model.py run on CPU.

The reference imports several packages absent from this image (tkinter,
cv2, torchvision, skimage) — all either unused at runtime or only
touched by code paths our parity tests never call.  These stubs satisfy
the imports so that `ref_model.NetworkA2B` etc. can be instantiated and
run on CPU torch as a golden reference.
"""

import importlib.util
import sys
import types

try:
    from . import pywt_shim
except ImportError:  # imported as a top-level module (benchmarks/)
    import pywt_shim


#: Root of the read-only upstream reference checkout.  Overridable so
#: CI/runners with the reference elsewhere can still run the golden
#: parity suite; when absent entirely (e.g. a plain clone on a hosted
#: runner) reference-backed tests skip instead of erroring.
import os

REFERENCE_ROOT = os.environ.get("FICSR_REFERENCE", "/root/reference")


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REFERENCE_ROOT, "model.py"))


def require_reference():
    """Skip the calling test when the reference tree is not present
    (raises FileNotFoundError outside pytest, e.g. benchmarks)."""
    if reference_available():
        return
    msg = f"reference tree not available at {REFERENCE_ROOT}"
    if "pytest" in sys.modules:
        import pytest
        pytest.skip(msg)
    raise FileNotFoundError(msg)


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install():
    pywt_shim.install()

    _stub("tkinter", NE="ne")
    _stub("cv2", namedWindow=lambda *a, **k: None)

    # torchvision: transforms/models touched only inside functions we
    # don't call (eval transforms, VGG perceptual loss)
    tv = _stub("torchvision")
    tf = _stub(
        "torchvision.transforms",
        Compose=lambda x: x, ToTensor=object, Normalize=lambda *a, **k: None,
        RandomCrop=lambda *a, **k: None, Resize=lambda *a, **k: None,
        CenterCrop=lambda *a, **k: None,
    )
    models = _stub("torchvision.models", vgg19=lambda *a, **k: None)
    tv.transforms = tf
    tv.models = models

    # skimage.metrics: backed by our own implementations
    from ficsr_tpu.ops import metrics as m

    sk = _stub("skimage")
    skm = _stub(
        "skimage.metrics",
        peak_signal_noise_ratio=m.peak_signal_noise_ratio,
        structural_similarity=m.structural_similarity,
        mean_squared_error=m.mean_squared_error,
        normalized_mutual_information=m.normalized_mutual_information,
    )
    sk.metrics = skm

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def load_reference_module(name: str):
    """Load <REFERENCE_ROOT>/<name>.py under the module name ref_<name>
    (skips the calling test when the reference tree is absent)."""
    require_reference()
    install()
    key = f"ref_{name}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(
        key, os.path.join(REFERENCE_ROOT, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod
