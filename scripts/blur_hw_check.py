"""Hardware validation + microbenchmark of the fused Pallas blur vs the XLA
depthwise path, on the shapes the 256px GIF models actually emit.

Runs on the real TPU; prints per-shape forward/grad parity and timings.
This is the staged runbook from ROUND3.md for deciding the
``GIF_TPU_PALLAS_BLUR`` default.  Goes through the public
``gif_tpu.ops.upfirdn`` / ``blur_pallas`` API.

Round-4 hardware result (v5e, bf16, 20 timed iters/shape; an earlier
interim note here claiming the kernel was slower came from the
pre-double-buffering version — see the history in blur_pallas.py):

    (16,257,257,128) pad(1,1): xla 27.52ms  pallas 5.50ms  5.00x
    (16,129,129,256) pad(1,1): xla 23.88ms  pallas 3.04ms  7.86x
    (16, 65, 65,512) pad(1,1): xla 24.50ms  pallas 2.71ms  9.05x
    (16,256,256,128) pad(2,1): xla  4.64ms  pallas 4.93ms  0.94x
    (16,128,128,256) pad(2,1): xla  3.00ms  pallas 2.63ms  1.14x
    (16, 64, 64,512) pad(2,1): xla  2.39ms  pallas 2.49ms  0.96x

relerr ~9e-3 fwd / ~1.2e-2 grad (bf16 inputs vs the XLA path).  XLA's
depthwise emitter collapses on ODD-size inputs (the convT intermediates)
**when the blur runs standalone** — but the in-model A/B (bench.py) showed
69.3 -> 52.6 imgs/s from routing those maps to the kernel: inside the step
XLA fuses the blur into the convT/conv chains and a custom call forces the
intermediates to materialize.  Default therefore stays XLA; see
ops/upfirdn.py::_pallas_blur_wanted.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gif_tpu.ops import blur_pallas
from gif_tpu.ops.upfirdn import make_resample_kernel, upfirdn2d

# (shape, pad) cases mirroring the model's blur call sites at 256px.
CASES = [
    ((16, 257, 257, 128), (1, 1, 1, 1)),   # post-upsample convT blur
    ((16, 129, 129, 256), (1, 1, 1, 1)),
    ((16, 65, 65, 512), (1, 1, 1, 1)),
    ((16, 256, 256, 128), (2, 1, 2, 1)),   # pre-downsample blur (D)
    ((16, 128, 128, 256), (2, 1, 2, 1)),
    ((16, 64, 64, 512), (2, 1, 2, 1)),
]
TAPS = (1, 3, 3, 1)


def xla_blur(x, pad4):
    return upfirdn2d(x, make_resample_kernel(TAPS), pad=pad4)


def pallas_blur(x, pad4):
    return blur_pallas.blur4_pallas(x, blur_pallas.taps_1d(TAPS, 1.0), pad4)


def bench(f, x, iters=50):
    np.asarray(f(x))  # warm + force completion (block_until_ready is a
    t0 = time.perf_counter()  # no-op on the axon tunnel)
    for _ in range(iters):
        y = f(x)
    np.asarray(jnp.sum(y))
    return (time.perf_counter() - t0) / iters * 1e3


def main(iters: int):
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    for shape, pad4 in CASES:
        if not blur_pallas.supports(shape, TAPS, 1, 1, pad4, 2):
            print(f"{shape} pad={pad4}: NOT SUPPORTED by planner")
            continue
        x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
        fa = jax.jit(lambda x, p=pad4: xla_blur(x, p))
        fb = jax.jit(lambda x, p=pad4: pallas_blur(x, p))
        ya = np.asarray(fa(x), dtype=np.float32)
        yb = np.asarray(fb(x), dtype=np.float32)
        err = np.max(np.abs(ya - yb)) / max(1e-6, np.max(np.abs(ya)))
        # Grad parity through a scalar loss.
        ga = jax.jit(
            jax.grad(lambda x, p=pad4: jnp.sum(jnp.square(xla_blur(x, p))).astype(jnp.float32))
        )
        gb = jax.jit(
            jax.grad(lambda x, p=pad4: jnp.sum(jnp.square(pallas_blur(x, p))).astype(jnp.float32))
        )
        da = np.asarray(ga(x), dtype=np.float32)
        db = np.asarray(gb(x), dtype=np.float32)
        gerr = np.max(np.abs(da - db)) / max(1e-6, np.max(np.abs(da)))

        ta = bench(fa, x, iters)
        tb = bench(fb, x, iters)
        bytes_moved = (np.prod(shape) + ya.size) * 2
        gbps = bytes_moved / (tb * 1e-3) / 1e9
        print(
            f"{shape} pad={pad4}: relerr={err:.2e} graderr={gerr:.2e} "
            f"xla={ta:.3f}ms pallas={tb:.3f}ms speedup={ta/tb:.2f}x ~{gbps:.0f}GB/s"
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=50)
    main(ap.parse_args().iters)
