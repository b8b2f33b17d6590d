"""Image resizing utilities.

``resize_bilinear`` matches torch ``F.interpolate(mode='bilinear',
align_corners=False)`` — jax.image.resize 'linear' uses the same half-pixel
sampling grid.  Used everywhere the reference calls ``fast_image_reshape``
(dataset_loaders.py:26-34) and the per-scale condition resize
(stg2_generator.py:309-314).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(
    x: jnp.ndarray, height: int, width: int, clamp: tuple | None = None
) -> jnp.ndarray:
    """Bilinear resize of NHWC images (half-pixel centers, no antialias)."""
    if x.shape[1] == height and x.shape[2] == width:
        out = x
    else:
        out = jax.image.resize(
            x, (x.shape[0], height, width, x.shape[3]), method="linear", antialias=False
        )
    if clamp is not None:
        out = jnp.clip(out, clamp[0], clamp[1])
    return out
