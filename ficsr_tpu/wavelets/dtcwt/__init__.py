"""Dual-tree complex wavelet transform (Kingsbury) on JAX/XLA."""

from ficsr_tpu.wavelets.dtcwt.coeffs import biort, level1, qshift
from ficsr_tpu.wavelets.dtcwt.transform2d import DTCWTForward, DTCWTInverse

DTCWT = DTCWTForward
IDTCWT = DTCWTInverse

__all__ = ["DTCWTForward", "DTCWTInverse", "DTCWT", "IDTCWT",
           "biort", "level1", "qshift"]
