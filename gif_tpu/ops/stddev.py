"""Minibatch standard-deviation feature (discriminator).

Reference: stg2_discriminator.py:56-65 — split the batch into groups of (at
most) ``group_size``, compute the biased std over the group per
(feat-chunk, channel, h, w), average it to one scalar per group, and append
it as an extra constant channel.

Sharding note: under data parallelism this op is computed *per shard*, which
matches the reference semantics exactly — torch ``nn.DataParallel`` scatters
the batch before the discriminator runs, so the group statistics were always
per-replica (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax.numpy as jnp


def minibatch_stddev(
    x: jnp.ndarray, group_size: int = 4, num_features: int = 1, eps: float = 1e-8
) -> jnp.ndarray:
    """Append the group-stddev channel.  x: (N, H, W, C) -> (N, H, W, C+F)."""
    n, h, w, c = x.shape
    g = min(n, group_size)
    f = num_features
    if n % g or c % f:
        raise ValueError(
            f"minibatch_stddev needs batch divisible by min(batch, "
            f"group_size)={g} and channels divisible by num_features={f}; "
            f"got batch {n}, channels {c} (reference constraint, "
            "stg2_discriminator.py:56-65)"
        )
    # (g, n//g, F, c//F, h, w) grouping over the *leading* axis, matching the
    # reference's ``view(group, -1, ...)``.
    y = x.reshape(g, n // g, h, w, f, c // f)
    var = jnp.var(y, axis=0)  # biased, over the group
    std = jnp.sqrt(var + eps)
    # Mean over channels-per-feature, h, w -> (n//g, F)
    avg = std.mean(axis=(1, 2, 4))
    avg = jnp.tile(avg[None], (g, 1, 1)).reshape(n, 1, 1, f)
    feat = jnp.broadcast_to(avg, (n, h, w, f)).astype(x.dtype)
    return jnp.concatenate([x, feat], axis=-1)
