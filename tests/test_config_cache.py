"""Persistent compile-cache environment hardening.

Covers the two machine-migration failure modes observed when a session moved
hosts: (a) loading a foreign-ISA XLA:CPU AOT entry SIGSEGVs inside
cpu_aot_loader — prevented by scoping the cache directory per host-CPU
fingerprint; (b) LoadedExecutable.serialize() of a very large XLA:CPU
executable SIGSEGVs nondeterministically — prevented by skipping persistence
of slow-compile CPU executables (config._install_cpu_cache_put_guard).
"""
import os

import pytest

from bobe_tpu import config


def test_host_fingerprint_stable_hex():
    fp = config._host_fingerprint()
    assert isinstance(fp, str) and len(fp) == 10
    int(fp, 16)  # hex
    assert fp == config._host_fingerprint()  # deterministic


def test_cache_dir_scoped_by_host_fingerprint():
    if os.environ.get("BOBE_TPU_NO_COMP_CACHE") or os.environ.get(
            "BOBE_TPU_COMP_CACHE_DIR"):
        pytest.skip("cache dir overridden in this environment")
    import jax

    d = jax.config.jax_compilation_cache_dir
    assert d is not None
    assert os.path.join(".jax_cache", "hosts",
                        config._host_fingerprint()) in d


@pytest.mark.parametrize("platform,t,allowed", [
    ("cpu", 30, False),    # big CPU executable: never persisted
    ("cpu", 3, True),      # small CPU executable: persisted
    ("cpu", None, True),   # unknown compile time: persisted
    ("tpu", 300, True),    # TPU executables always persist
])
def test_cpu_cache_put_policy(platform, t, allowed, monkeypatch):
    monkeypatch.delenv("BOBE_TPU_CPU_CACHE_MAX_COMPILE_S", raising=False)
    assert config._cpu_cache_put_allowed(platform, t) is allowed


def test_cpu_cache_put_threshold_env(monkeypatch):
    monkeypatch.setenv("BOBE_TPU_CPU_CACHE_MAX_COMPILE_S", "100")
    assert config._cpu_cache_put_allowed("cpu", 30)
    monkeypatch.setenv("BOBE_TPU_CPU_CACHE_MAX_COMPILE_S", "1")
    assert not config._cpu_cache_put_allowed("cpu", 2)


@pytest.mark.parametrize("platform,size,allowed", [
    ("cpu", 50_000_000, False),   # mega CPU entry: read as miss
    ("cpu", 100_000, True),       # small CPU entry: deserialized
    ("tpu", 400_000_000, True),   # TPU entries always readable
])
def test_cpu_cache_get_policy(platform, size, allowed, monkeypatch):
    monkeypatch.delenv("BOBE_TPU_CPU_CACHE_MAX_ENTRY_MB", raising=False)
    assert config._cpu_cache_get_allowed(platform, size) is allowed


def test_get_guard_reads_oversized_cpu_entry_as_miss(monkeypatch):
    """An oversized CPU entry must come back as a miss without reaching
    backend.deserialize_executable (the crash site)."""
    from jax._src import compilation_cache as cc

    assert getattr(cc, "_bobe_cpu_get_guard", False)

    class FakeCache:
        def get(self, key):
            return b"x" * (5 * 10**6)

    class FakeBackend:
        platform = "cpu"

        def deserialize_executable(self, *a):  # pragma: no cover
            raise AssertionError("deserialize reached for mega CPU entry")

    monkeypatch.setattr(cc, "_get_cache", lambda backend: FakeCache())
    out = cc.get_executable_and_time("k", None, FakeBackend(), None)
    assert out == (None, None)


def test_put_guard_installed_and_blocks_serialize():
    """The guard must return before touching the executable at all — a
    poison serialize() proves the big-CPU path never reaches XLA."""
    from jax._src import compilation_cache as cc

    assert getattr(cc, "_bobe_cpu_put_guard", False)

    class PoisonExecutable:
        def serialize(self):  # pragma: no cover - must never run
            raise AssertionError("serialize() reached for big CPU exe")

    class FakeBackend:
        platform = "cpu"

    out = cc.put_executable_and_time("k", "m", PoisonExecutable(),
                                     FakeBackend(), 9999)
    assert out is None
