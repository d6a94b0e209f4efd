"""Model zoo: dual-branch frequency generators, frequency-aware
discriminators, and the loss set."""

from ficsr_tpu.models.generators import (
    NetworkA2B,
    NetworkB2A,
    ResBlock,
    ResnetGenerator,
    ShallowNet,
    UnetGenerator,
    UnetSkipConnectionBlock,
)
from ficsr_tpu.models.discriminators import (
    FSDiscriminator,
    FSDiscriminatorA,
    FSDiscriminatorB,
    PatchGAN,
)
from ficsr_tpu.models import losses
from ficsr_tpu.models.layers import BatchNorm2d, Conv2d, ConvTranspose2d

__all__ = [
    "NetworkA2B", "NetworkB2A", "ResBlock", "ResnetGenerator", "ShallowNet",
    "UnetGenerator", "UnetSkipConnectionBlock",
    "FSDiscriminator", "FSDiscriminatorA", "FSDiscriminatorB", "PatchGAN",
    "losses", "BatchNorm2d", "Conv2d", "ConvTranspose2d",
]
