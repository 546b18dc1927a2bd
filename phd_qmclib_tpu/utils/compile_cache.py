"""Persistent-compile-cache hygiene.

JAX's on-disk compilation cache (``jax_compilation_cache_dir``) writes
entries with a plain ``Path.write_bytes`` (``jax/_src/lru_cache.py``,
``LRUCache.put``), which is NOT atomic: a process killed mid-write — a
watchdog timeout, a CI kill, ctrl-C — leaves a truncated entry on disk.
Reading such an entry later does not fail gracefully: XLA's
``deserialize_executable`` hard-aborts the whole process (C++ CHECK),
so one interrupted run can permanently break every subsequent run that
shares the cache directory.  Both our test suite (``tests/conftest.py``)
and the benchmark harness (``bench.py``, whose parent watchdog kills
hung children BY DESIGN) share cache directories across processes, so
this is a live failure mode, observed in practice.

``enable_persistent_cache`` turns the cache on AND makes entry writes
atomic (same-directory temp file + ``os.replace``), with a startup
sweep that removes leftover temp files and obviously-truncated
(zero-length) entries.
"""
import os
import time
import warnings

import jax

__all__ = ["enable_persistent_cache", "harden_cache_writes"]


def _sweep(cache_dir: str) -> None:
    """Remove leftover temp files / empty entries from crashed runs."""
    try:
        names = os.listdir(cache_dir)
    except OSError:
        return
    for name in names:
        path = os.path.join(cache_dir, name)
        try:
            if ".__tmp." in name or os.path.getsize(path) == 0:
                os.unlink(path)
        except OSError:
            pass  # racing process already cleaned it


def harden_cache_writes() -> None:
    """Make ``LRUCache.put`` atomic (idempotent, safe to call twice)."""
    from jax._src import lru_cache as _lru

    if getattr(_lru.LRUCache.put, "_atomic_writes", False):
        return

    suffix = _lru._CACHE_SUFFIX
    atime_suffix = _lru._ATIME_SUFFIX

    def atomic_put(self, key, val):
        # Mirrors the upstream body (jax 0.9, lru_cache.py:121-161)
        # with the single write replaced by temp-file + rename, which
        # is atomic within one directory on POSIX.
        if not key:
            raise ValueError("key cannot be empty")
        if self.eviction_enabled and len(val) > self.max_size:
            warnings.warn(
                f"Cache value for key {key!r} of size {len(val)} bytes "
                f"exceeds the maximum cache size of {self.max_size} "
                f"bytes")
            return
        cache_path = self.path / f"{key}{suffix}"
        if self.eviction_enabled:
            self.lock.acquire(timeout=self.lock_timeout_secs)
        try:
            if cache_path.exists():
                return
            if self.eviction_enabled:
                self._evict_if_needed(additional_size=len(val))
            tmp_path = self.path / f"{key}{suffix}.__tmp.{os.getpid()}"
            try:
                tmp_path.write_bytes(val)
                os.replace(tmp_path, cache_path)
            except OSError:
                try:
                    tmp_path.unlink()
                except OSError:
                    pass
                return  # a failed cache write must never fail the run
            if self.eviction_enabled:
                timestamp = time.time_ns().to_bytes(8, "little")
                atime_path = self.path / f"{key}{atime_suffix}"
                atime_path.write_bytes(timestamp)
        finally:
            if self.eviction_enabled:
                self.lock.release()

    atomic_put._atomic_writes = True
    _lru.LRUCache.put = atomic_put


def enable_persistent_cache(cache_dir: str,
                            min_compile_time_secs: float = 0.2) -> None:
    """Enable the on-disk compile cache at ``cache_dir``, hardened."""
    os.makedirs(cache_dir, exist_ok=True)
    _sweep(cache_dir)
    harden_cache_writes()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
