"""Conditional StyleGAN2 residual discriminator.

Parity with reference model/stg2_discriminator.py: the input is
``concat(image, condition)`` along channels (9 channels for full GIF —
train.py:350-353), a 1x1 fromRGB ConvLayer, log2(size)-2 ResBlocks down to
4x4, minibatch-stddev, a final 3x3 conv and a 2-layer equalized MLP to a
scalar score.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn

from gif_tpu.models.layers import ConvLayer, ResBlock, EqualLinear
from gif_tpu import ops


def discriminator_channels(
    channel_multiplier: int = 2, max_channels: int = 512
) -> dict:
    chans = {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }
    return {k: min(v, max_channels) for k, v in chans.items()}


class Discriminator(nn.Module):
    size: int = 256
    channel_multiplier: int = 2
    max_channels: int = 512  # cap on the channel map (512 = reference parity)
    stddev_group: int = 4
    stddev_feat: int = 1
    dtype: jnp.dtype = jnp.float32  # compute dtype of the conv stack

    @nn.compact
    def __call__(self, image: jnp.ndarray, condition: jnp.ndarray | None = None):
        """image: (B, S, S, 3); condition: (B, S, S, C_cond) or None.

        Returns (B, 1) scores (f32).
        """
        chans = discriminator_channels(self.channel_multiplier, self.max_channels)
        x = image
        if condition is not None:
            x = jnp.concatenate([image, condition], axis=-1)

        x = ConvLayer(chans[self.size], 1, dtype=self.dtype, name="from_rgb")(x)
        log_size = int(math.log2(self.size))
        for i in range(log_size, 2, -1):
            x = ResBlock(chans[2 ** (i - 1)], dtype=self.dtype, name=f"res{i}")(x)

        # Head runs f32 (stddev statistics + score head are tiny).
        x = ops.minibatch_stddev(
            x.astype(jnp.float32),
            group_size=self.stddev_group,
            num_features=self.stddev_feat,
        )
        x = ConvLayer(chans[4], 3, name="final_conv")(x)
        x = x.reshape(x.shape[0], -1)
        x = EqualLinear(chans[4], activation=True, name="final_dense")(x)
        return EqualLinear(1, name="out")(x)
