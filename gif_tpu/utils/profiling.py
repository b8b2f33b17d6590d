"""Profiling: jax.profiler trace capture and step timing.

Replaces the reference's ad-hoc ``time()`` prints (SURVEY.md §5.1) with a
trace context for the profiler UI plus a robust step timer.

NOTE on timing: on some experimental platforms (the 'axon' TPU tunnel)
``jax.block_until_ready`` does not actually block, and every dispatch +
host readback carries tens of ms of tunnel latency.  ``StepTimer`` therefore
times *chains* of dependent steps with one host readback at the end — the
only reliable wall-clock protocol there.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def force_ready(tree) -> float:
    """Force device completion via a scalar host readback; returns the sum
    of the first leaf (cheap, dependency-carrying)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


class StepTimer:
    """MEAN wall time per step of a chained step function.

    ``fn(carry, i) -> carry`` is called ``iters`` times with the carry fed
    back (serializing execution); ONE readback closes the chain.  A median
    would need a readback per iteration, which on the dispatch-only axon
    platform both serializes host<->device and perturbs what is measured —
    the deliberate trade is straggler sensitivity for an unperturbed chain.
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup

    def time(self, fn, carry, iters: int = 10) -> float:
        for i in range(self.warmup):
            carry = fn(carry, i)
        force_ready(carry)
        t0 = time.perf_counter()
        for i in range(iters):
            carry = fn(carry, i)
        force_ready(carry)
        return (time.perf_counter() - t0) / iters
