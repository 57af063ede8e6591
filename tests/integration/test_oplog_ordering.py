"""Regression tests for the ADVICE r4 op-log ordering findings.

The lockstep invariant (parallel/oplog.py): the op-log must be a valid
serialization of the leader's device enqueue order. Round 4's background
gang IVF rebuild could emit+enqueue a collective program holding only
the chunks lock while another leader thread emitted an artifacts op
holding only the artifacts lock — cross-ordered logs deadlock the gang.
Fixes under test:

- under a multi-process mesh the two corpora share ONE RLock, so every
  emit+enqueue window is leader-wide atomic by construction;
- the automatic (insert-triggered) gang IVF rebuild stands down under
  multi-process unless DENSE_IVF_AUTO_REBUILD_MULTIHOST opts in;
- the follower's 'compact' apply invalidates derived IVF state exactly
  like the leader's (apply_compact_device is the shared implementation).
"""

import numpy as np
import jax.numpy as jnp

from cadence_rag_tpu.config import settings
from cadence_rag_tpu.core import index as index_mod
from cadence_rag_tpu.core.index import CorpusIndex, DeviceIndexManager, IvfState


def _tiny_corpus() -> CorpusIndex:
    return CorpusIndex(
        "chunks", dim=8, lex_dim=16, tech_slots=4, capacity=8
    )


def _dummy_ivf(overflow_count: int = 100, built_count: int = 16) -> IvfState:
    return IvfState(
        centroids=jnp.zeros((2, 8), jnp.float32),
        buckets=jnp.zeros((2, 4), jnp.int32),
        overflow=jnp.full((8,), -1, jnp.int32),
        overflow_count=overflow_count,
        built_count=built_count,
        n_clusters=2,
        nprobe=1,
    )


class TestSharedDispatchLock:
    def test_multiprocess_manager_shares_one_lock(self, monkeypatch):
        monkeypatch.setattr(index_mod, "_multiprocess", lambda: True)
        mgr = DeviceIndexManager()
        assert mgr.chunks.lock is mgr.artifacts.lock

    def test_single_process_keeps_separate_locks(self, monkeypatch):
        monkeypatch.setattr(index_mod, "_multiprocess", lambda: False)
        mgr = DeviceIndexManager()
        assert mgr.chunks.lock is not mgr.artifacts.lock


class TestAutoRebuildStanddown:
    def test_stands_down_under_multiprocess(self, monkeypatch):
        corpus = _tiny_corpus()
        corpus.ivf = _dummy_ivf()
        monkeypatch.setattr(index_mod, "_multiprocess", lambda: True)
        monkeypatch.setattr(settings, "dense_ivf_enabled", True)
        monkeypatch.setattr(
            settings, "dense_ivf_auto_rebuild_multihost", False
        )
        corpus._maybe_schedule_ivf_rebuild()
        assert corpus._ivf_rebuilding is False
        assert corpus._ivf_rebuild_warned is True

    def test_opt_in_allows_rebuild(self, monkeypatch):
        corpus = _tiny_corpus()
        corpus.ivf = _dummy_ivf()
        monkeypatch.setattr(index_mod, "_multiprocess", lambda: True)
        monkeypatch.setattr(settings, "dense_ivf_enabled", True)
        monkeypatch.setattr(
            settings, "dense_ivf_auto_rebuild_multihost", True
        )
        calls = []
        monkeypatch.setattr(
            corpus, "build_ivf",
            lambda **kw: calls.append(kw),
        )
        corpus._maybe_schedule_ivf_rebuild()
        # the rebuild thread runs build_ivf (recorded stub) and clears
        # the in-flight flag when done
        for _ in range(200):
            if calls and not corpus._ivf_rebuilding:
                break
            import time

            time.sleep(0.01)
        assert calls, "opt-in multihost auto-rebuild did not fire"
        assert corpus._ivf_rebuilding is False

    def test_single_process_still_schedules(self, monkeypatch):
        corpus = _tiny_corpus()
        corpus.ivf = _dummy_ivf()
        monkeypatch.setattr(index_mod, "_multiprocess", lambda: False)
        monkeypatch.setattr(settings, "dense_ivf_enabled", True)
        calls = []
        monkeypatch.setattr(
            corpus, "build_ivf", lambda **kw: calls.append(kw)
        )
        corpus._maybe_schedule_ivf_rebuild()
        for _ in range(200):
            if calls and not corpus._ivf_rebuilding:
                break
            import time

            time.sleep(0.01)
        assert calls, "single-process auto-rebuild did not fire"


class TestCompactInvalidatesIvf:
    def test_apply_compact_device_clears_ivf(self):
        """The follower's 'compact' op (parallel/oplog._apply) calls
        apply_compact_device — it must invalidate the position-derived
        IVF state exactly like the leader's _compact_locked, or the
        follower keeps stale buckets with invalid row positions."""
        corpus = _tiny_corpus()
        corpus.ivf = _dummy_ivf()
        corpus._ivf_overflow_host = np.array([1, 2, 3], dtype=np.int32)
        pad_live = np.zeros(8, dtype=np.int32)
        corpus.apply_compact_device(pad_live, 0, 8)
        assert corpus.ivf is None
        assert corpus._ivf_overflow_host.size == 0


class TestSoakDecayGate:
    def test_too_few_windows_fails_explicitly(self):
        from cadence_rag_tpu.evals.soak import evaluate_decay

        first, last, failure = evaluate_decay([], 0.7)
        assert failure is not None and "populated sample window" in failure
        first, last, failure = evaluate_decay(
            [{"scan_mrows_s": 100.0}], 0.7
        )
        assert failure is not None

    def test_decay_detected_and_clean_pass(self):
        from cadence_rag_tpu.evals.soak import evaluate_decay

        good = [{"scan_mrows_s": v} for v in (100, 101, 99, 100)]
        first, last, failure = evaluate_decay(good, 0.7)
        assert failure is None and first > 0 and last > 0
        bad = [{"scan_mrows_s": v} for v in (100, 100, 20, 20)]
        first, last, failure = evaluate_decay(bad, 0.7)
        assert failure is not None and "decayed" in failure
