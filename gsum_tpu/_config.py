"""Global configuration for gsum_tpu.

The library targets 1e-8 agreement with the reference implementation
(see BASELINE.md), which requires float64 arithmetic.  JAX disables
float64 by default, so we enable it at import time unless the user opts
out via the ``GSUM_TPU_NO_X64`` environment variable.  Performance paths
(``gsum_tpu.ops``) construct float32/bfloat16 arrays explicitly, so
enabling x64 does not slow them down.
"""
from __future__ import annotations

import os

import jax

if not os.environ.get("GSUM_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# XLA compiles are expensive (seconds each for special-function graphs);
# persist them across processes.  Opt out with GSUM_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("GSUM_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "GSUM_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gsum_tpu_jax"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass


def default_dtype():
    """The default floating dtype honoring the x64 flag."""
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
