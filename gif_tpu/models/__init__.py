"""GIF model family: conditional StyleGAN2 generator/discriminator and the
FLAME texture-space inverse renderer."""

from gif_tpu.models.generator import StyledGenerator, SynthesisNetwork
from gif_tpu.models.discriminator import Discriminator
from gif_tpu.models.texture_space import flame_texture_space

__all__ = [
    "StyledGenerator",
    "SynthesisNetwork",
    "Discriminator",
    "flame_texture_space",
]
