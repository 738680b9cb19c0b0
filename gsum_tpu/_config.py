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

# XLA compiles are expensive (minutes each through this box's remote TPU
# compile service); persist them across processes.  Opt out with
# GSUM_TPU_NO_COMPILE_CACHE=1 — which tests/conftest.py does: XLA:CPU
# executable AOT (de)serialization is unreliable on this machine (the
# loader logs a compile-vs-host feature mismatch warning about SIGILL on
# every cross-process hit, and three suite runs crashed natively inside
# the cache get/put path), so the CPU suite runs cacheless.  An
# already-configured cache dir is respected.
if not os.environ.get("GSUM_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get("GSUM_TPU_COMPILE_CACHE_DIR")
    if _cache_dir is None and jax.config.jax_compilation_cache_dir is None:
        _cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "gsum_tpu_jax")
    if _cache_dir is not None:
        try:
            os.makedirs(_cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
        except Exception:  # pragma: no cover — cache is best-effort
            pass

# XLA:CPU executable AOT (de)serialization is unreliable on this
# machine: cross-process cache hits load executables whose recorded
# machine features don't match the host (the loader warns about SIGILL)
# and several full runs crashed natively inside the cache get/put path,
# while TPU entries (serialized by the remote compile service) have been
# solid.  Gate the persistent cache per backend: CPU compiles skip it
# entirely (jax consults ``compilation_cache.is_cache_used(backend)``
# before both lookup and write — returning False there is the supported
# off-switch).  This protects any process that switches to the CPU
# backend after import (tests, the driver's multichip dryrun) without
# giving up the cache for TPU work in the same interpreter.  Opt back in
# with GSUM_TPU_CPU_COMPILE_CACHE=1.
if not os.environ.get("GSUM_TPU_CPU_COMPILE_CACHE"):
    try:
        from jax._src import compilation_cache as _cc

        if not getattr(_cc, "_gsum_cpu_cache_guard", False):
            _orig_is_cache_used = _cc.is_cache_used

            def _is_cache_used(backend):
                if getattr(backend, "platform", None) == "cpu":
                    return False
                return _orig_is_cache_used(backend)

            _cc.is_cache_used = _is_cache_used
            _cc._gsum_cpu_cache_guard = True
    except Exception:  # pragma: no cover — hardening is best-effort
        pass

# jax's LRUCache.put writes entries with a bare Path.write_bytes — NOT
# atomic.  A process killed mid-write (timeout SIGTERM/SIGKILL, a crash)
# leaves a truncated entry, and a later reader hands the truncated bytes
# to the native zstd/executable deserializer, which crashes the process
# (observed on this machine: SIGSEGV in
# compilation_cache.get_executable_and_time and SIGABRT in the same
# path, from entries left by killed runs).  Patch the write to the
# standard temp-file + os.replace dance so entries are all-or-nothing.
# Applied even when THIS process opts out of the cache
# (GSUM_TPU_NO_COMPILE_CACHE): the patch is inert unless jax writes an
# entry, and it protects any cache dir this interpreter later enables.
try:
    from jax._src import lru_cache as _lru

    if not getattr(_lru.LRUCache, "_gsum_atomic_put", False):
        import pathlib

        _orig_put = _lru.LRUCache.put

        def _atomic_write_bytes(path, data):
            tmp = path.with_name(path.name + ".tmp-%d" % os.getpid())
            tmp.write_bytes(data)
            os.replace(tmp, path)

        class _AtomicPath(type(pathlib.Path())):
            def write_bytes(p, data):
                return _atomic_write_bytes(pathlib.Path(str(p)), data)

        def _put(self, key, val):
            # swap self.path to the atomic-writing subclass ONCE and leave
            # it (child paths derived via `/` keep the subclass).  An
            # earlier version swapped it around each _orig_put call with a
            # try/finally restore, but puts can race from two compile
            # threads and one thread's restore would hand the other a
            # plain Path mid-write — reintroducing the bare write_bytes
            # this patch exists to remove.
            if not isinstance(self.path, _AtomicPath):
                self.path = _AtomicPath(str(self.path))
            return _orig_put(self, key, val)

        _lru.LRUCache.put = _put
        _lru.LRUCache._gsum_atomic_put = True
except Exception:  # pragma: no cover — hardening is best-effort
    pass


def default_dtype():
    """The default floating dtype honoring the x64 flag."""
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
