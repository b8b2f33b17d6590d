import os, sys, time
os.environ["GIF_TPU_PALLAS_BLUR"] = "1"
import jax, jax.numpy as jnp, numpy as np
from gif_tpu.ops import blur_pallas, upfirdn

print("backend:", jax.default_backend(), flush=True)
shape, pad4 = (16, 257, 257, 128), (1, 1, 1, 1)
TAPS = (1, 3, 3, 1)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)

t0 = time.perf_counter()
fb = jax.jit(lambda x: blur_pallas.blur4_pallas(x, blur_pallas.taps_1d(TAPS, 1.0), pad4))
yb = fb(x); yb.block_until_ready()
print(f"pallas compile+run {time.perf_counter()-t0:.1f}s", flush=True)

fa = jax.jit(lambda x: upfirdn.upfirdn2d(x, upfirdn._cached_kernel(TAPS, 1.0), pad=pad4))
ya = fa(x); ya.block_until_ready()
err = np.max(np.abs(np.asarray(ya, np.float32) - np.asarray(yb, np.float32)))
print("maxerr:", err, flush=True)

def bench(f, iters=50):
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x)
    y.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3

ta, tb = bench(fa), bench(fb)
print(f"xla={ta:.3f}ms pallas={tb:.3f}ms speedup={ta/tb:.2f}x", flush=True)
