"""Evaluation: InceptionV3 FID (the de-facto GIF quality metric) and
sampling utilities."""

from gif_tpu.eval.inception import InceptionV3FID, convert_torch_inception
from gif_tpu.eval.fid import (
    FidComputer,
    frechet_distance,
    activation_statistics,
)

__all__ = [
    "InceptionV3FID",
    "convert_torch_inception",
    "FidComputer",
    "frechet_distance",
    "activation_statistics",
]
