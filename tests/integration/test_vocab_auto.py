"""Drift-triggered automatic vocab rebuild + multi-writer layout
coherence (core/vocab.auto_rebuild_if_needed, ingest.rehydrate_doc_rows).

The reference's analogue is rebuilding pg_search's BM25 index after a
tokenizer change — a DBA operation. Here the learned head must follow
corpus drift, and because a rebuild can now run ONLINE inside the serving
process, rows written concurrently by other processes carry
lex_vocab_version provenance so stale-layout signatures are detected and
re-featurized at rehydration instead of silently scoring garbage.
"""

import numpy as np
import pytest

from cadence_rag_tpu.config import settings
from cadence_rag_tpu.core import vocab as vocab_mod
from cadence_rag_tpu.core.index import get_index
from cadence_rag_tpu.ingest import featurize
from cadence_rag_tpu.ingest.ingest import (
    ingest_transcript,
    set_store_only,
)
from cadence_rag_tpu.ingest.sync import get_syncer
from cadence_rag_tpu.schemas import (
    CallRef,
    ChunkingOptions,
    RetrieveRequest,
    UtteranceIn,
)
from cadence_rag_tpu.store.db import get_store


def _utts(texts):
    return [
        UtteranceIn(
            speaker="Ana", start_ts_ms=i * 1000, end_ts_ms=i * 1000 + 900,
            text=t,
        )
        for i, t in enumerate(texts)
    ]


def _ingest(prefix, texts):
    for i, t in enumerate(texts):
        ingest_transcript(
            CallRef(external_id=f"{prefix}-{i}"),
            _utts([t]),
            ChunkingOptions(target_tokens=10, max_tokens=60,
                            overlap_tokens=0),
        )


BASE_TEXTS = [
    "the ECONNRESET fix landed after a long rollback debate",
    "object store tiering to SSD approved by the platform team",
    "retry storms caused the ECONNRESET cascade in the gateway",
    "gateway timeout budget raised to nine hundred milliseconds",
]

# a later vocabulary regime: frequent features the original head never saw
DRIFT_TEXTS = [
    f"kubernetes pod eviction storm in the frankfurt region shard {i} "
    "kubernetes eviction frankfurt"
    for i in range(12)
]


@pytest.fixture()
def auto_settings(tmp_store, monkeypatch):
    monkeypatch.setattr(settings, "lex_vocab_auto_rebuild", True)
    monkeypatch.setattr(settings, "lex_vocab_drift_buckets", 2)
    monkeypatch.setattr(settings, "lex_vocab_rebuild_min_growth", 1.2)
    monkeypatch.setattr(settings, "lex_vocab_rebuild_cooldown_s", 0.0)
    monkeypatch.setattr(settings, "lex_vocab_rebuild_check_s", 0.0)
    monkeypatch.setattr(settings, "lex_vocab_bootstrap_docs", 0)
    return tmp_store


class TestAutoRebuild:
    def test_bootstrap_builds_first_vocab(self, auto_settings, monkeypatch):
        monkeypatch.setattr(settings, "lex_vocab_bootstrap_docs", 3)
        _ingest("boot", BASE_TEXTS)
        assert featurize.active_vocab()[1] == 0
        summary = vocab_mod.auto_rebuild_if_needed(
            get_store(), get_index(), force_check=True
        )
        assert summary is not None and summary["version"] == 1
        assert "bootstrap" in summary["trigger"]
        assert featurize.active_vocab()[1] == 1
        # rows were re-stamped with the new layout version
        with get_store().read() as conn:
            versions = {
                int(r[0]) for r in conn.execute(
                    "SELECT lex_vocab_version FROM chunks"
                )
            }
        assert versions == {1}

    def test_bootstrap_needs_min_docs(self, auto_settings, monkeypatch):
        monkeypatch.setattr(settings, "lex_vocab_bootstrap_docs", 100)
        _ingest("small", BASE_TEXTS)
        assert vocab_mod.auto_rebuild_if_needed(
            get_store(), get_index(), force_check=True
        ) is None

    def test_drift_plus_growth_triggers_rebuild(self, auto_settings):
        _ingest("base", BASE_TEXTS)
        store, index = get_store(), get_index()
        first = vocab_mod.build_and_apply(store, index, head=16)
        assert first["version"] == 1

        # new regime: frequent features outside the v1 head hash into the
        # collision tail and outscore the head's median df
        _ingest("drift", DRIFT_TEXTS)
        summary = vocab_mod.auto_rebuild_if_needed(
            store, index, force_check=True
        )
        assert summary is not None and summary["version"] == 2
        assert "drift" in summary["trigger"]
        assert featurize.active_vocab()[1] == 2

        # the new regime's hot query still retrieves its documents
        from cadence_rag_tpu.engine.retrieve import retrieve_evidence

        got = retrieve_evidence(RetrieveRequest(
            query="kubernetes eviction frankfurt",
            return_style="ids_only",
        ))["retrieved_ids"]
        assert got

    def test_growth_guard_blocks(self, auto_settings, monkeypatch):
        _ingest("base", BASE_TEXTS)
        store, index = get_store(), get_index()
        vocab_mod.build_and_apply(store, index, head=16)
        monkeypatch.setattr(settings, "lex_vocab_rebuild_min_growth", 50.0)
        _ingest("drift", DRIFT_TEXTS)
        assert vocab_mod.auto_rebuild_if_needed(
            store, index, force_check=True
        ) is None

    def test_cooldown_blocks(self, auto_settings, monkeypatch):
        _ingest("base", BASE_TEXTS)
        store, index = get_store(), get_index()
        vocab_mod.build_and_apply(store, index, head=16)
        monkeypatch.setattr(
            settings, "lex_vocab_rebuild_cooldown_s", 3600.0
        )
        _ingest("drift", DRIFT_TEXTS)
        assert vocab_mod.auto_rebuild_if_needed(
            store, index, force_check=True
        ) is None

    def test_disabled_and_multiprocess_standdown(self, auto_settings,
                                                 monkeypatch):
        _ingest("base", BASE_TEXTS)
        store, index = get_store(), get_index()
        monkeypatch.setattr(settings, "lex_vocab_auto_rebuild", False)
        assert vocab_mod.auto_rebuild_if_needed(
            store, index, force_check=True
        ) is None
        monkeypatch.setattr(settings, "lex_vocab_auto_rebuild", True)
        monkeypatch.setattr(settings, "dist_num_processes", 2)
        assert vocab_mod.auto_rebuild_if_needed(
            store, index, force_check=True
        ) is None


class TestStaleSigRepair:
    def test_raced_writer_row_is_repaired_at_sync(self, tmp_store):
        """A worker that featurized under the PREVIOUS layout (its job
        raced the rebuild) writes version-stamped rows; the serving
        process's syncer re-featurizes them before device insert and
        fixes the store blob."""
        _ingest("base", BASE_TEXTS)
        store, index = get_store(), get_index()
        syncer = get_syncer()
        syncer.init_watermark()
        vocab_mod.build_and_apply(store, index, head=16)

        # simulate the raced writer: store-only ingest under the OLD
        # (headless) layout
        active = featurize.active_vocab()
        featurize.set_active_vocab(None, 0)
        set_store_only(True)
        try:
            _ingest("raced", ["frankfurt eviction storm in the gateway"])
        finally:
            set_store_only(False)
            featurize.set_active_vocab(*active)

        with store.read() as conn:
            raced = conn.execute(
                "SELECT chunk_id, text, lex_sig, lex_vocab_version FROM "
                "chunks WHERE lex_vocab_version=0"
            ).fetchall()
        assert len(raced) == 1
        stale_sig = np.frombuffer(raced[0]["lex_sig"], np.int8)

        n_before = index.chunks.count
        # the repair featurizes BEFORE the insert lands, so its avgdl is
        # the pre-insert value
        avgdl = index.chunks.avgdl or 400.0
        counts = syncer.poll_once()
        assert counts.get("inserted") == 1
        assert index.chunks.count == n_before + 1

        # the store blob was rewritten under the active layout
        with store.read() as conn:
            fixed = conn.execute(
                "SELECT lex_sig, lex_dl, lex_vocab_version FROM chunks "
                "WHERE chunk_id=?", (int(raced[0]["chunk_id"]),),
            ).fetchone()
        assert int(fixed["lex_vocab_version"]) == 1
        expect_sig, _t, expect_dl = featurize.lexical_signature(
            raced[0]["text"], avgdl
        )
        got_sig = np.frombuffer(fixed["lex_sig"], np.int8)
        assert not np.array_equal(got_sig, stale_sig)
        np.testing.assert_array_equal(got_sig, expect_sig)
        assert int(fixed["lex_dl"]) == int(expect_dl)

        # and the DEVICE row matches the repaired layout
        pos = index.chunks.position_of([int(raced[0]["chunk_id"])])[0]
        dev_sig = np.asarray(index.chunks.lex)[pos]
        np.testing.assert_array_equal(dev_sig, expect_sig)

    def test_layout_lag_process_does_not_repair_backward(self, tmp_store,
                                                         caplog):
        """A process whose own active vocab LAGS the store (it missed an
        external rebuild) must not 'repair' newer rows to its old
        layout."""
        _ingest("base", BASE_TEXTS)
        store, index = get_store(), get_index()
        syncer = get_syncer()
        syncer.init_watermark()
        vocab_mod.build_and_apply(store, index, head=16)
        _ingest("fresh", ["tiering approved for the frankfurt region"])

        with store.read() as conn:
            row = conn.execute(
                "SELECT chunk_id, lex_sig FROM chunks ORDER BY chunk_id "
                "DESC LIMIT 1"
            ).fetchone()
        before = bytes(row["lex_sig"])

        # wind this process's layout back (as if it missed the rebuild)
        active = featurize.active_vocab()
        featurize.set_active_vocab(None, 0)
        try:
            from cadence_rag_tpu.ingest.ingest import rehydrate_doc_rows

            with store.read() as conn:
                from cadence_rag_tpu.ingest.ingest import (
                    DOC_ROW_SELECT,
                )

                rows = conn.execute(
                    DOC_ROW_SELECT.format(
                        id_col="chunk_id", table="chunks", text_col="text"
                    ) + "WHERE t.chunk_id=?",
                    (int(row["chunk_id"]),),
                ).fetchall()
            rehydrate_doc_rows(store, "chunks", rows)
        finally:
            featurize.set_active_vocab(*active)

        with store.read() as conn:
            after = conn.execute(
                "SELECT lex_sig FROM chunks WHERE chunk_id=?",
                (int(row["chunk_id"]),),
            ).fetchone()
        assert bytes(after["lex_sig"]) == before  # untouched
        assert any("layout_lag" in r.message for r in caplog.records)


class TestQueryLayoutSwapMidBatch:
    def test_dispatch_refeaturizes_after_swap(self, tmp_store):
        """A vocab swap landing between a batch's featurization and its
        dispatch must not score old-layout query vectors against
        new-layout rows."""
        _ingest("base", BASE_TEXTS + DRIFT_TEXTS[:4])
        store, index = get_store(), get_index()
        from cadence_rag_tpu.engine import retrieve as eng

        reqs = [RetrieveRequest(query="ECONNRESET rollback gateway",
                                return_style="ids_only"),
                RetrieveRequest(query="kubernetes eviction frankfurt",
                                return_style="ids_only")]
        plans = eng._prepare_plans(reqs)
        # swap the layout mid-flight
        vocab_mod.build_and_apply(store, index, head=16)
        responses = eng._finish_plans(plans, eng._dispatch_plans(plans))
        fresh = eng.retrieve_evidence_batch([
            r.model_copy(deep=True) for r in reqs
        ])
        assert [r["retrieved_ids"] for r in responses] == [
            r["retrieved_ids"] for r in fresh
        ]
        assert all(p.lex_vocab_gen == 1 for p in plans)


class TestAdoptExternalRebuild:
    def _external_rebuild(self, store):
        """Simulate ANOTHER process running build_lex_vocab against the
        shared store: learn + persist a vocab and rewrite the store's
        blobs under the new layout — without touching THIS process's
        featurizer or device index (the lagging-process scenario)."""
        prev = featurize.active_vocab()
        hashes = vocab_mod.build_vocab_from_store(store, head=16)
        version = vocab_mod.save_vocab(
            store, hashes, int(settings.lexical_dim)
        )
        featurize.set_active_vocab(
            np.unique(np.asarray(hashes, np.uint64)), version
        )
        try:
            for table, id_col, text_col in vocab_mod.CORPUS_COLUMNS:
                with store.read() as conn:
                    rows = conn.execute(
                        f"SELECT {id_col} AS id, {text_col} AS txt "
                        f"FROM {table}"
                    ).fetchall()
                if not rows:
                    continue
                sigs = featurize.lexical_signatures_batch(
                    [r["txt"] for r in rows], 400.0
                )
                with store.tx() as conn:
                    conn.executemany(
                        f"UPDATE {table} SET lex_sig=?, lex_dl=?, "
                        f"lex_vocab_version=? WHERE {id_col}=?",
                        [
                            (s.tobytes(), int(dl), version, int(r["id"]))
                            for (s, _t, dl), r in zip(sigs, rows)
                        ],
                    )
            vocab_mod.mark_applied(store, version)
        finally:
            featurize.set_active_vocab(*prev)
        return version

    def test_syncer_adopts_external_layout(self, tmp_store):
        """The store syncer detects a store-applied vocab this process
        never activated, adopts it, and re-scatters device signatures
        from the store — queries keep matching afterward."""
        _ingest("base", BASE_TEXTS + DRIFT_TEXTS[:6])
        store, index = get_store(), get_index()
        syncer = get_syncer()
        syncer.init_watermark()

        version = self._external_rebuild(store)
        assert featurize.active_vocab()[1] == 0  # this process lags

        syncer.poll_once()
        assert featurize.active_vocab()[1] == version

        # device lexical state now matches the store layout: the hot
        # query of the new regime retrieves its documents
        from cadence_rag_tpu.engine.retrieve import retrieve_evidence

        got = retrieve_evidence(RetrieveRequest(
            query="kubernetes eviction frankfurt",
            return_style="ids_only", debug=True,
        ))
        assert got["retrieved_ids"]
        lex_lane = got["debug"]["lanes"]["chunks"]["bm25"]
        assert lex_lane  # lexical lane scored under the adopted layout

        # df table was rebuilt from the adopted signatures
        with store.read() as conn:
            n_chunks = conn.execute(
                "SELECT COUNT(*) FROM chunks"
            ).fetchone()[0]
        assert index.chunks.doc_freq.sum() > 0
        assert index.chunks.count == n_chunks

    def test_adoption_repairs_straggler_rows(self, tmp_store):
        """Rows still stamped with an older version at adoption time are
        re-featurized from text and written back."""
        _ingest("base", BASE_TEXTS)
        store, index = get_store(), get_index()
        syncer = get_syncer()
        syncer.init_watermark()
        version = self._external_rebuild(store)

        # one straggler row the external apply "missed"
        with store.read() as conn:
            row = conn.execute(
                "SELECT chunk_id FROM chunks ORDER BY chunk_id LIMIT 1"
            ).fetchone()
        with store.tx() as conn:
            conn.execute(
                "UPDATE chunks SET lex_vocab_version=0 WHERE chunk_id=?",
                (int(row["chunk_id"]),),
            )

        syncer.poll_once()
        assert featurize.active_vocab()[1] == version
        with store.read() as conn:
            got = conn.execute(
                "SELECT lex_vocab_version FROM chunks WHERE chunk_id=?",
                (int(row["chunk_id"]),),
            ).fetchone()
        assert int(got["lex_vocab_version"]) == version
