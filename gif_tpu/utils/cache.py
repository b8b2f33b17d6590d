"""Persistent XLA compilation cache.

The full training program (step + eval + viz forwards) costs minutes of
XLA compile time per process launch; the persistent cache brings repeat
launches (resumes, benchmark A/Bs, experiment arms that differ only in
seeds/data) down to seconds.  Call :func:`enable_compilation_cache` before
the first ``jit`` execution — entry points (train.py, bench.py) do this by
default.

Env knobs:
  GIF_TPU_CACHE_DIR   cache location (default ~/.cache/gif_tpu/xla)
  GIF_TPU_NO_CACHE=1  disable entirely
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a stable directory.

    Returns the cache dir, or None when disabled via GIF_TPU_NO_CACHE=1.
    Safe to call multiple times; the last dir wins.
    """
    if os.environ.get("GIF_TPU_NO_CACHE") == "1":
        return None
    import jax

    # Processes attached to a remote-compile tunnel write executables built
    # on the REMOTE host's CPU into the cache; a later local-only process
    # loading such an XLA:CPU AOT artifact trips machine-feature mismatch
    # warnings (and risks SIGILL on genuinely missing ISA extensions).
    # Segregate the two worlds.
    tag = "tunnel" if os.environ.get("PALLAS_AXON_POOL_IPS") else "local"
    cache_dir = (
        cache_dir
        or os.environ.get("GIF_TPU_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "gif_tpu", "xla", tag
        )
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that takes longer than a second to compile; the
    # default threshold only caches multi-second programs.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
