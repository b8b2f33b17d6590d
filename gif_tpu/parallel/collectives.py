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
    ACROSS processes).  Rows are INTERLEAVED round-robin across processes
    (row 0 of every process, then row 1, ...), so a ``max_rows`` truncation
    keeps a near-uniform share from every host's stream — a process-order
    concatenation would reduce to process 0's buffer alone whenever its
    accumulator is already at ``max_rows`` (every steady-state FID eval).
    Row alignment between the arrays is preserved.  Single-process: a no-op
    (modulo truncation).
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
    # Round-robin row order over the (process, row) grid, identical for
    # every array so alignment survives: valid (r, p) pairs sorted by r.
    rows = np.arange(cap)[:, None]  # (cap, 1)
    valid = rows < counts[None, :]  # (cap, P)
    flat_idx = (np.arange(len(counts))[None, :] * cap + rows)[valid]
    out = []
    for a in arrays:
        pad = np.zeros((cap - n,) + a.shape[1:], a.dtype)
        gathered = np.asarray(
            multihost_utils.process_allgather(np.concatenate([a, pad], 0))
        )  # (P, cap, ...)
        pooled = gathered.reshape((-1,) + gathered.shape[2:])[flat_idx]
        out.append(pooled[:max_rows])
    return tuple(out)
