"""Mesh construction and placement helpers (single- and multi-process).

The GIF workload is a 256px conv GAN whose parameters fit on one chip, so
the primary scaling axis is the batch: a 1-D ``data`` mesh with replicated
parameters and `lax.pmean` gradient all-reduce over ICI (the TPU-native
equivalent of the reference's ``nn.DataParallel`` wrapping at
train.py:344 — SURVEY.md §5.8).

Multi-host (DCN) support — what is actually wired and tested:
:func:`initialize_distributed` wraps ``jax.distributed.initialize``;
:func:`create_mesh` then builds the mesh over the GLOBAL device set,
:func:`shard_batch` assembles a global batch from per-process local
shards via ``jax.make_array_from_process_local_data``, and the training
loop guards checkpoint/metrics/FID/viz to process 0.  This path is
exercised end to end by ``tests/test_multiprocess.py`` — two JAX
processes x four virtual CPU devices each, gloo collectives, running the
real sharded train step and the real :func:`gif_tpu.train.loop.train`
loop.  Real-pod DCN execution is the same program with the TPU plugin
supplying the cross-slice transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or create) the multi-process JAX runtime.

    On TPU pods all three arguments are auto-detected from the environment
    (call with no arguments); for CPU/GPU multi-process runs pass them
    explicitly.  Safe to call once per process, before any other JAX API.
    The reference analog is the implicit single-host ``nn.DataParallel``
    boundary (train.py:344); here the same train step spans hosts.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """True on the process that owns checkpoints / metrics / FID / viz."""
    return jax.process_index() == 0


def create_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D mesh over the first ``n_devices`` GLOBAL devices (default: all).

    Under ``jax.distributed`` this spans every process's devices; each
    process must pass the same arguments (SPMD).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), tuple(axis_names))


def choose_data_mesh_size(
    batch_size: int,
    n_dev: int,
    n_proc: int = 1,
    min_per_shard: int = 1,
) -> int:
    """How many devices the 1-D data mesh should span (pure logic, unit-
    tested; used by the train.py CLI).

    Single process: shrink to the largest device count that divides the
    batch with >= ``min_per_shard`` samples per shard (spare devices idle,
    like the reference's DataParallel with a short batch).  Multi-process:
    the mesh MUST span all global devices — a prefix mesh would orphan
    remote processes' devices, and a collapse to one device would train
    independent diverging copies — so invalid geometry raises instead.
    """
    if n_dev <= 1:
        return 1
    if n_proc > 1:
        if batch_size % n_dev or batch_size // n_dev < min_per_shard:
            raise ValueError(
                f"multihost run needs batch_size divisible by the {n_dev} "
                f"global devices with >= {min_per_shard} samples per "
                f"shard; got batch_size={batch_size}"
            )
        return n_dev
    use = min(n_dev, max(1, batch_size // min_per_shard))
    while batch_size % use:  # shard_map needs even division
        use -= 1
    return use


def local_data_parallel_mesh() -> Optional[Mesh]:
    """All (global) devices as a data mesh, or None on a single device."""
    if len(jax.devices()) <= 1:
        return None
    return create_mesh()


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh.

    Multi-process: every process must pass the SAME host values (e.g. from
    a deterministic init or a restored checkpoint) — the global array is
    assembled from each process's local copy via
    ``jax.make_array_from_callback`` (no cross-host transfer), the SPMD
    convention for replicated parameters.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:

        def _rep(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )

        return jax.tree.map(_rep, tree)
    return jax.device_put(tree, sharding)


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Batch dict of host arrays -> global arrays sharded along axis 0.

    Single-process: a plain sharded ``device_put``.  Multi-process: each
    process passes its LOCAL slice of the batch (local_batch = global /
    process_count) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the TPU-native replacement
    for the reference DataLoader feeding one host (train.py:356-358).
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def host_local_tree(tree):
    """Fully-replicated global pytree -> host numpy pytree.

    Valid on every process (replicated arrays are addressable everywhere);
    used to hand replicated state to process-local consumers (Orbax save on
    process 0, the eval sampler) without a cross-process collective.
    """
    return jax.tree.map(lambda x: np.asarray(x), tree)
