"""TPU-native differentiable wavelet transform library.

Rebuilds the capability surface of the vendored `pytorch_wavelets`
v1.3.0 (`/root/reference/pytorch_wavelets/`) on JAX/XLA/Pallas:

  * 2-D DWT/IDWT (multi-level, five padding modes, analytic adjoints)
  * 1-D DWT/IDWT
  * SWT (stationary / undecimated, à-trous)
  * DTCWT (dual-tree complex wavelet transform) + ScatterNet
  * fused Pallas Haar kernel for the discriminator hot path
"""

from ficsr_tpu.wavelets.coeffs import Wavelet, get_wavelet, wavelist, dwt_coeff_len
from ficsr_tpu.wavelets.transform2d import (
    DWTForward,
    DWTInverse,
    dwt2,
    idwt2,
    wavedec2,
    waverec2,
)
from ficsr_tpu.wavelets.transform1d import (
    DWT1DForward,
    DWT1DInverse,
    dwt1,
    idwt1,
    wavedec1,
    waverec1,
)
from ficsr_tpu.wavelets.swt import SWTForward, SWTInverse, iswt2, swt2
from ficsr_tpu.wavelets.dtcwt import DTCWTForward, DTCWTInverse
from ficsr_tpu.wavelets.scatternet import ScatLayer, ScatLayerj2

# aliases mirroring pytorch_wavelets' public API
# (`pytorch_wavelets/pytorch_wavelets/__init__.py:1-36`)
DWT = DWTForward
IDWT = DWTInverse
DWT2D = DWTForward
IDWT2D = DWTInverse
DWT1D = DWT1DForward
IDWT1D = DWT1DInverse

__all__ = [
    "Wavelet", "get_wavelet", "wavelist", "dwt_coeff_len",
    "DWTForward", "DWTInverse", "dwt2", "idwt2", "wavedec2", "waverec2",
    "DWT1DForward", "DWT1DInverse", "dwt1", "idwt1", "wavedec1", "waverec1",
    "SWTForward", "SWTInverse", "swt2", "iswt2",
    "DTCWTForward", "DTCWTInverse", "ScatLayer", "ScatLayerj2",
    "DWT", "IDWT", "DWT2D", "IDWT2D", "DWT1D", "IDWT1D",
]
