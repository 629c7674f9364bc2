"""Runtime residency LRU (engines/residency.py).

The reference has no counterpart mechanism — it reloads models per
chunk in venv subprocesses (ref: tts_backends/base_runner.py:278-332),
so its "memory management" is process exit. Resident engines need the
opposite: an explicit budget so six model families can't pile up on a
16 GB chip.
"""

import threading

import pytest

from vocalie_tts_tpu.engines.base import TTSEngine
from vocalie_tts_tpu.engines.residency import RESIDENCY, RuntimeResidency


# ── pure manager behavior ──────────────────────────────────────────────


def _mk(released):
    def release(key):
        def _r():
            released.append(key)
        return _r
    return release


def test_unlimited_budget_never_evicts(monkeypatch):
    monkeypatch.delenv("VOCALIE_MAX_RESIDENT_RUNTIMES", raising=False)
    mgr = RuntimeResidency()
    released = []
    rel = _mk(released)
    for key in "abcdef":
        mgr.note_use(key, rel(key))
    assert released == []
    assert list(mgr.resident()) == list("abcdef")


def test_lru_eviction_order_and_self_exemption(monkeypatch):
    monkeypatch.setenv("VOCALIE_MAX_RESIDENT_RUNTIMES", "2")
    mgr = RuntimeResidency()
    released = []
    rel = _mk(released)
    mgr.note_use("a", rel("a"))
    mgr.note_use("b", rel("b"))
    assert released == []
    # c arrives → a (least recent) goes
    mgr.note_use("c", rel("c"))
    assert released == ["a"]
    # touch b → now c is LRU; d arrives → c goes, never d itself
    mgr.note_use("b", rel("b"))
    mgr.note_use("d", rel("d"))
    assert released == ["a", "c"]
    assert set(mgr.resident()) == {"b", "d"}


def test_budget_one_keeps_only_current(monkeypatch):
    monkeypatch.setenv("VOCALIE_MAX_RESIDENT_RUNTIMES", "1")
    mgr = RuntimeResidency()
    released = []
    rel = _mk(released)
    mgr.note_use("x", rel("x"))
    mgr.note_use("y", rel("y"))
    mgr.note_use("x", rel("x"))
    assert released == ["x", "y"]
    assert list(mgr.resident()) == ["x"]


def test_explicit_release_and_release_all(monkeypatch):
    monkeypatch.delenv("VOCALIE_MAX_RESIDENT_RUNTIMES", raising=False)
    mgr = RuntimeResidency()
    released = []
    rel = _mk(released)
    mgr.note_use("a", rel("a"))
    mgr.note_use("b", rel("b"))
    assert mgr.release("a") is True
    assert mgr.release("a") is False  # already gone
    assert released == ["a"]
    assert mgr.release_all() == 1
    assert released == ["a", "b"]
    assert mgr.resident() == {}


def test_garbage_budget_means_unlimited(monkeypatch):
    monkeypatch.setenv("VOCALIE_MAX_RESIDENT_RUNTIMES", "many")
    mgr = RuntimeResidency()
    released = []
    rel = _mk(released)
    for key in "abc":
        mgr.note_use(key, rel(key))
    assert released == []


def test_note_use_thread_safety(monkeypatch):
    monkeypatch.setenv("VOCALIE_MAX_RESIDENT_RUNTIMES", "3")
    mgr = RuntimeResidency()
    lock = threading.Lock()
    released = []

    def rel(key):
        def _r():
            with lock:
                released.append(key)
        return _r

    def worker(prefix):
        for i in range(50):
            key = f"{prefix}{i % 5}"
            mgr.note_use(key, rel(key))

    threads = [threading.Thread(target=worker, args=(p,)) for p in "pqr"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # invariant under any interleaving: at most budget entries resident
    assert len(mgr.resident()) <= 3


# ── engine integration ─────────────────────────────────────────────────


@pytest.fixture
def scratch_engines():
    """Two throwaway engine classes that build cheap sentinel runtimes
    through the real _acquire_runtime path; deregistered afterwards."""

    class _ScratchA(TTSEngine):
        id = "scratch_resident_a"
        display_name = "Scratch A"
        builds = 0

        def _get_runtime(self):
            def build():
                type(self).builds += 1
                return {"engine": self.id, "n": type(self).builds}
            return self._acquire_runtime(build)

        def synthesize_chunk(self, *a, **kw):  # pragma: no cover
            raise NotImplementedError

    class _ScratchB(_ScratchA):
        id = "scratch_resident_b"
        display_name = "Scratch B"
        builds = 0

    try:
        yield _ScratchA, _ScratchB
    finally:
        for cls in (_ScratchA, _ScratchB):
            TTSEngine._REGISTRY.pop(cls.id, None)
            TTSEngine._INSTANCES.pop(cls.id, None)
            RESIDENCY.release(cls.id)


def test_engine_acquire_builds_once_and_registers(scratch_engines, monkeypatch):
    monkeypatch.delenv("VOCALIE_MAX_RESIDENT_RUNTIMES", raising=False)
    A, _ = scratch_engines
    eng = A.instance()
    rt1 = eng._get_runtime()
    rt2 = eng._get_runtime()
    assert rt1 is rt2 and A.builds == 1
    assert "scratch_resident_a" in RESIDENCY.resident()


def test_engine_eviction_drops_and_rebuilds(scratch_engines, monkeypatch):
    A, B = scratch_engines
    monkeypatch.setenv("VOCALIE_MAX_RESIDENT_RUNTIMES", "1")
    a, b = A.instance(), B.instance()
    a._get_runtime()
    b._get_runtime()              # budget 1 → evicts a's runtime
    assert a._runtime is None
    assert b._runtime is not None
    a._get_runtime()              # rebuild on next use, evicting b
    assert A.builds == 2
    assert b._runtime is None


def test_release_runtime_direct(scratch_engines, monkeypatch):
    monkeypatch.delenv("VOCALIE_MAX_RESIDENT_RUNTIMES", raising=False)
    A, _ = scratch_engines
    eng = A.instance()
    assert eng.release_runtime() is False  # nothing resident yet
    eng._get_runtime()
    assert eng.release_runtime() is True
    assert eng._runtime is None


def test_concurrent_cold_build_is_single(scratch_engines, monkeypatch):
    """Two jobs hitting a cold engine must not materialize weights twice."""
    monkeypatch.delenv("VOCALIE_MAX_RESIDENT_RUNTIMES", raising=False)
    A, _ = scratch_engines
    eng = A.instance()
    barrier = threading.Barrier(4)
    results = []

    def hit():
        barrier.wait()
        results.append(eng._get_runtime())

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert A.builds == 1
    assert all(r is results[0] for r in results)
