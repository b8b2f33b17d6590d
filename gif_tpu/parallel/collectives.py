"""Host-side cross-process collectives for the training loop.

Multi-host training feeds each process an independent data stream, so
host-side accumulators (the FID conditioning buffer, dataset_loaders.py:
200-223) diverge per process.  :func:`allgather_rows` pools them: a
variable-row-count allgather built from fixed-shape
``multihost_utils.process_allgather`` calls (pad to the max count, gather,
unpad).  Every process must call it (it is a collective); every process
receives the same pooled result.  SURVEY.md §5.8 (host-side FID allgather).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax


def allgather_rows(
    arrays: Sequence[np.ndarray], max_rows: int | None = None
) -> Tuple[np.ndarray, ...]:
    """Gather row-aligned host arrays from every process along axis 0.

    ``arrays`` share a leading length on each process (which may differ
    ACROSS processes).  Returns the process-order concatenation, truncated
    to ``max_rows``; row alignment between the arrays is preserved.
    Single-process: a no-op (modulo truncation).
    """
    arrays = tuple(np.ascontiguousarray(a) for a in arrays)
    n = len(arrays[0])
    for a in arrays:
        assert len(a) == n, "allgather_rows arrays must be row-aligned"
    if jax.process_count() == 1:
        return tuple(a[:max_rows] for a in arrays)

    from jax.experimental import multihost_utils

    counts = np.asarray(
        multihost_utils.process_allgather(np.array([n], np.int64))
    ).reshape(-1)
    cap = int(counts.max())
    out = []
    for a in arrays:
        pad = np.zeros((cap - n,) + a.shape[1:], a.dtype)
        gathered = np.asarray(
            multihost_utils.process_allgather(np.concatenate([a, pad], 0))
        )
        parts = [gathered[p, : int(counts[p])] for p in range(len(counts))]
        out.append(np.concatenate(parts, 0)[:max_rows])
    return tuple(out)
