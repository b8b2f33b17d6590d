"""Shared utilities: image resize, EMA, visualization, profiling."""

from gif_tpu.utils.image import resize_bilinear
from gif_tpu.utils.ema import ema_update

__all__ = ["resize_bilinear", "ema_update"]
