"""Mesh construction and placement helpers.

The GIF workload is a 256px conv GAN whose parameters fit on one chip, so
the primary scaling axis is the batch: a 1-D ``data`` mesh with replicated
parameters and `lax.pmean` gradient all-reduce over ICI (the TPU-native
equivalent of the reference's ``nn.DataParallel`` — SURVEY.md §5.8).  The
helpers also accept multi-host device sets: ``jax.distributed.initialize``
before calling :func:`create_mesh` and the same code spans slices over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), tuple(axis_names))


def local_data_parallel_mesh() -> Optional[Mesh]:
    """All local devices as a data mesh, or None on a single device."""
    if len(jax.devices()) <= 1:
        return None
    return create_mesh()


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Shard every array in ``batch`` along its leading axis."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
