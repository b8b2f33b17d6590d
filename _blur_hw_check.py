"""Hardware validation of the fused Pallas blur vs the XLA depthwise path.

Runs on the real TPU: parity (fwd + grad) and timing on the shapes the
256px generator/discriminator actually emit.
"""
import os
os.environ["GIF_TPU_PALLAS_BLUR"] = "1"
import time

import jax
import jax.numpy as jnp
import numpy as np

from gif_tpu.ops import blur_pallas, upfirdn

print("backend:", jax.default_backend(), jax.devices())

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
    k = upfirdn._cached_kernel(TAPS, 1.0)
    return upfirdn.upfirdn2d(x, k, pad=pad4)

def pallas_blur(x, pad4):
    return blur_pallas.blur4_pallas(x, blur_pallas.taps_1d(TAPS, 1.0), pad4)

rng = np.random.default_rng(0)
for shape, pad4 in CASES:
    sup = blur_pallas.supports(shape, TAPS, 1, 1, pad4, 2)
    x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
    if not sup:
        print(f"{shape} pad={pad4}: NOT SUPPORTED by planner")
        continue
    fa = jax.jit(lambda x: xla_blur(x, pad4))
    fb = jax.jit(lambda x: pallas_blur(x, pad4))
    ya = np.asarray(fa(x), dtype=np.float32)
    yb = np.asarray(fb(x), dtype=np.float32)
    err = np.max(np.abs(ya - yb)) / max(1e-6, np.max(np.abs(ya)))
    # grad parity through a scalar loss
    ga = jax.jit(jax.grad(lambda x: jnp.sum(jnp.square(xla_blur(x, pad4))).astype(jnp.float32)))
    gb = jax.jit(jax.grad(lambda x: jnp.sum(jnp.square(pallas_blur(x, pad4))).astype(jnp.float32)))
    da = np.asarray(ga(x), dtype=np.float32)
    db = np.asarray(gb(x), dtype=np.float32)
    gerr = np.max(np.abs(da - db)) / max(1e-6, np.max(np.abs(da)))

    def bench(f, x, iters=50):
        f(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(x)
        y.block_until_ready()
        return (time.perf_counter() - t0) / iters * 1e3

    ta = bench(fa, x)
    tb = bench(fb, x)
    bytes_moved = (np.prod(shape) + ya.size) * 2
    gbps = bytes_moved / (tb * 1e-3) / 1e9
    print(f"{shape} pad={pad4}: relerr={err:.2e} graderr={gerr:.2e} "
          f"xla={ta:.3f}ms pallas={tb:.3f}ms speedup={ta/tb:.2f}x ~{gbps:.0f}GB/s")
