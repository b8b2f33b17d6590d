"""Exponential moving average over parameter pytrees.

Reference: ``generic_utils.accumulate`` (my_utils/generic_utils.py:63-76)
with StyleGAN2's decay 0.5 ** (32 / 10_000) (train.py:250).
"""

from __future__ import annotations

import jax

STYLEGAN2_EMA_DECAY = 0.5 ** (32 / (10 * 1000))


def ema_update(ema_params, new_params, decay: float = STYLEGAN2_EMA_DECAY):
    """ema <- decay * ema + (1 - decay) * new, leaf-wise."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, new_params
    )
