"""gsum_tpu._config environment hardening.

The library force-enables jax's persistent compilation cache (compiles
on this machine go through a slow remote TPU compile service) and
hardens it in two ways that these tests pin down:

1. ``LRUCache.put`` is patched to write atomically (temp file +
   ``os.replace``).  Upstream jax writes entries with a bare
   ``Path.write_bytes``; a process killed mid-write (``timeout``, a
   crash) leaves a truncated entry, and later readers hand the truncated
   bytes to the native zstd/executable deserializer, which crashes the
   process (observed repeatedly on this machine — see
   .claude/skills/verify/SKILL.md).
2. An already-configured ``jax_compilation_cache_dir`` (or the
   ``GSUM_TPU_COMPILE_CACHE_DIR``/``GSUM_TPU_NO_COMPILE_CACHE`` env
   vars) is respected rather than stomped.

The suite itself runs with the persistent cache disabled (conftest.py),
so these tests exercise the patched put directly on a standalone
LRUCache instance — no executable (de)serialization is involved.
"""
import os

import pytest

import gsum_tpu  # noqa: F401  (applies the patch on import)


def _get_lru():
    try:
        from jax._src.lru_cache import LRUCache
    except Exception:  # pragma: no cover — jax internals moved
        pytest.skip("jax._src.lru_cache not available in this jax")
    return LRUCache


def test_lru_put_patched_and_atomic(tmp_path):
    LRUCache = _get_lru()
    assert getattr(LRUCache, "_gsum_atomic_put", False), (
        "gsum_tpu._config did not apply the atomic-put patch")

    cache = LRUCache(str(tmp_path), max_size=-1)
    payload = b"x" * 4096
    cache.put("somekey", payload)

    # the entry round-trips
    assert cache.get("somekey") == payload
    # and no temp residue is left behind (the .tmp-<pid> staging file
    # must have been renamed over the final name)
    names = [p.name for p in tmp_path.iterdir()]
    assert any("somekey" in n for n in names)
    assert not any(".tmp-" in n for n in names), names


def test_lru_put_interrupted_write_leaves_no_entry(tmp_path, monkeypatch):
    """A write that dies mid-stream must not produce a readable entry.

    Simulated by making the staging write raise after creating the temp
    file: the final cache path must not exist afterwards, so a reader
    sees a clean miss instead of truncated bytes.
    """
    LRUCache = _get_lru()
    cache = LRUCache(str(tmp_path), max_size=-1)

    import pathlib

    real_write = pathlib.Path.write_bytes

    def exploding_write(self, data):
        if ".tmp-" in self.name:
            # emulate the process dying mid-write: the temp file exists
            # (possibly partial) but os.replace never runs
            real_write(self, data[: len(data) // 2])
            raise RuntimeError("killed mid-write")
        return real_write(self, data)

    monkeypatch.setattr(pathlib.Path, "write_bytes", exploding_write)
    with pytest.raises(RuntimeError):
        cache.put("k2", b"y" * 4096)
    monkeypatch.undo()

    assert cache.get("k2") is None, (
        "interrupted write produced a (truncated) readable entry")


def test_config_respects_preexisting_cache_dir(tmp_path):
    """_config must not stomp a cache dir the host process configured
    before importing gsum_tpu (subprocess test: import order matters)."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir', %r)\n"
        "import gsum_tpu\n"
        "assert jax.config.jax_compilation_cache_dir == %r, "
        "jax.config.jax_compilation_cache_dir\n"
        "print('OK')\n" % (str(tmp_path), str(tmp_path))
    )
    env = dict(os.environ)
    env.pop("GSUM_TPU_NO_COMPILE_CACHE", None)
    env.pop("GSUM_TPU_COMPILE_CACHE_DIR", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_cpu_backend_skips_persistent_cache():
    """The persistent compile cache must be OFF for CPU backends: XLA:CPU
    executable AOT (de)serialization is unreliable on this machine (loader
    feature-mismatch warnings, native crashes in the cache get/put path —
    see .claude/skills/verify/SKILL.md), while TPU entries are solid."""
    from jax._src import compilation_cache as cc

    assert getattr(cc, "_gsum_cpu_cache_guard", False), (
        "gsum_tpu._config did not install the per-backend cache guard")

    class _FakeBackend:
        platform = "cpu"

    assert cc.is_cache_used(_FakeBackend()) is False

    # non-CPU backends still go through jax's own decision logic: the
    # guard must delegate, not hard-code an answer
    class _FakeTpu:
        platform = "tpu"
        platform_version = "fake"

    assert cc.is_cache_used(_FakeTpu()) in (True, False)


def test_lru_put_is_thread_race_safe(tmp_path):
    """The patch must not swap self.path back and forth around each put:
    with two racing puts, a restore-style implementation hands one thread
    a plain Path mid-write (a bare, non-atomic write_bytes).  The current
    shape upgrades self.path ONCE and leaves it; after any put, the
    instance path stays the atomic subclass and concurrent puts all
    round-trip with no temp residue."""
    import threading

    LRUCache = _get_lru()
    cache = LRUCache(str(tmp_path), max_size=-1)
    errs = []

    def worker(i):
        try:
            for j in range(20):
                cache.put("key-%d-%d" % (i, j), b"v" * 512)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # path stays upgraded (write_bytes overridden), not restored
    assert type(cache.path).__name__ == "_AtomicPath"
    assert not any(".tmp-" in p.name for p in tmp_path.iterdir())
    for i in range(4):
        assert cache.get("key-%d-0" % i) == b"v" * 512
