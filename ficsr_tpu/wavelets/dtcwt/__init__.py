"""Dual-tree complex wavelet transform (Kingsbury) on JAX/XLA."""

from ficsr_tpu.wavelets.dtcwt.coeffs import biort, level1, qshift
from ficsr_tpu.wavelets.dtcwt.quad import (
    DTCWTForward2,
    DTCWTInverse2,
    quad_afb2d,
    quad_afb2d_nonsep,
)
from ficsr_tpu.wavelets.dtcwt.transform2d import DTCWTForward, DTCWTInverse

DTCWT = DTCWTForward
IDTCWT = DTCWTInverse

__all__ = ["DTCWTForward", "DTCWTInverse", "DTCWT", "IDTCWT",
           "DTCWTForward2", "DTCWTInverse2", "quad_afb2d",
           "quad_afb2d_nonsep", "biort", "level1", "qshift"]
