"""Runtime setup: persistent compilation cache + matmul precision.

First compiles through the axon tunnel take minutes; the persistent cache
makes every later process start warm. Call setup_runtime() at every CLI
entry point before the first jit.
"""

from __future__ import annotations

import os


def setup_runtime(matmul_precision: str | None = None,
                  cache_dir: str | None = None) -> None:
    import jax

    # AOT_TPU_BACKEND=cpu pins the platform via jax.config (the env var
    # JAX_PLATFORMS=cpu is NOT equivalent here: the axon TPU plugin's
    # backend hook still dials the tunnel under it and blocks forever when
    # the tunnel is down, while the config route skips it entirely).
    backend = os.environ.get("AOT_TPU_BACKEND")
    if backend:
        jax.config.update("jax_platforms", backend)

    cache_dir = cache_dir or os.environ.get(
        "AOT_TPU_CACHE", os.path.expanduser("~/.cache/aot_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)
