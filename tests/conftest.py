"""Test configuration: run on CPU with 8 virtual devices, float64 enabled.

Must set environment variables BEFORE jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin on this machine ignores the JAX_PLATFORMS env var;
# the config route does select the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NO persistent compilation cache for the suite.  XLA:CPU executable
# AOT (de)serialization is unreliable on this box: every cross-process
# cache hit logs a compile-vs-host machine-feature mismatch
# (cpu_aot_loader.cc: "+prefer-no-scatter is not supported on the host
# machine ... could lead to execution errors such as SIGILL"), and
# full-suite runs crashed natively inside exactly that path (SIGSEGV in
# get_executable_and_time, SIGSEGV in put_executable_and_time /
# executable.serialize, SIGABRT in get) while the same tests pass
# standalone.  The in-process jit cache is unaffected.  The TPU cache
# (a different, data-only serialization that has been reliable here)
# stays enabled for normal library use via gsum_tpu._config — the env
# var below opts the suite and its subprocess tests out.
os.environ.setdefault("GSUM_TPU_NO_COMPILE_CACHE", "1")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _unmap_compiled_executables_per_module():
    """Releases compiled executables after each test module.

    Every XLA:CPU compile pins multiple memory mappings (JIT code pages)
    for as long as the executable lives, and jit caches keep them alive
    for the whole process: a full-suite run was measured crossing 22k
    mappings at 60% with the kernel's vm.max_map_count at 65,530.  Once
    mmap starts failing, native code crashes in whatever allocates next
    — observed as SIGSEGV inside XLA compilation at ~99% of the suite
    (and earlier in cache (de)serialization), while the same tests pass
    standalone.  Dropping the caches at module boundaries keeps the
    mapping count bounded; anything still needed simply recompiles.
    """
    yield
    jax.clear_caches()
