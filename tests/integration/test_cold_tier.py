"""Beyond-HBM cold tier (core/coldtier.py, INDEX_MAX_DEVICE_ROWS).

Rows past the device-row cap spill to host RAM and are scanned by the
same fused lane program in streamed blocks, lane-merged before RRF. The
load-bearing property: a capped index returns EXACTLY what an uncapped
one returns — same formulas, corpus-wide df/avgdl/idf, deterministic tie
order (hot rows are the earlier ids, so hot-before-cold on ties equals
id order).
"""

import numpy as np
import pytest

from cadence_rag_tpu.config import settings
from cadence_rag_tpu.core.index import get_index, reset_index
from cadence_rag_tpu.embed.pipeline import run_embedding_backfill
from cadence_rag_tpu.engine.retrieve import retrieve_evidence_batch
from cadence_rag_tpu.ingest.ingest import (
    delete_call,
    ingest_transcript,
    rebuild_index_from_store,
)
from cadence_rag_tpu.schemas import (
    CallRef,
    ChunkingOptions,
    RetrieveFilters,
    RetrieveRequest,
    UtteranceIn,
)

TEXTS = [
    "ECONNRESET errors flooded the object store gateway",
    "rollback of v2.3.1 fixed the ECONNRESET cascade",
    "SSD tiering cut p99 latency on the ingest cluster",
    "lenovo BOM review for the dell bake-off next week",
    "azure migration cutover runbook approved by finance",
    "gateway timeout budget raised after the retry storm",
    "kubernetes pod eviction storm in the frankfurt region",
    "postgres replication lag alarmed during the failover drill",
    "object store tiering policy review moved to thursday",
    "retry budget tuning for the ingest cluster gateway",
    "finance approved the frankfurt region capacity plan",
    "ECONNRESET monitoring dashboards shipped to the oncall",
]

QUERIES = [
    "ECONNRESET object store gateway",
    "tiering latency ingest cluster",
    "frankfurt eviction kubernetes",
    "v2.3.1 rollback",
    "finance capacity plan",
]


def _fill(prefix="ct"):
    call_ids = []
    for i, t in enumerate(TEXTS):
        cid, _, _ = ingest_transcript(
            CallRef(external_id=f"{prefix}-{i}"),
            [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900, text=t)],
            ChunkingOptions(target_tokens=10, max_tokens=40,
                            overlap_tokens=0),
        )
        call_ids.append(cid)
    run_embedding_backfill(batch_size=8)
    return call_ids


def _results(style="ids_only", queries=QUERIES, filters=None):
    reqs = [
        RetrieveRequest(query=q, return_style=style, filters=filters)
        for q in queries
    ]
    return retrieve_evidence_batch(reqs)


def _recap(monkeypatch, max_rows, block_rows=8):
    """Rebuild the device index from the store under a row cap."""
    monkeypatch.setattr(settings, "index_max_device_rows", max_rows)
    monkeypatch.setattr(settings, "cold_block_rows", block_rows)
    reset_index()
    rebuild_index_from_store()


class TestColdTierOracle:
    def test_capped_matches_uncapped(self, tmp_store, monkeypatch):
        _fill()
        uncapped_ids = [r["retrieved_ids"] for r in _results()]
        uncapped_packs = _results(style="evidence_pack_json")

        _recap(monkeypatch, max_rows=4, block_rows=8)
        index = get_index()
        assert index.chunks.count == 4
        assert index.chunks.cold is not None
        assert index.chunks.cold.count == len(TEXTS) - 4

        capped_ids = [r["retrieved_ids"] for r in _results()]
        assert capped_ids == uncapped_ids
        capped_packs = _results(style="evidence_pack_json")
        for a, b in zip(capped_packs, uncapped_packs):
            assert a["quotes"] == b["quotes"]
            assert a["artifacts"] == b["artifacts"]

    def test_filters_apply_to_cold_rows(self, tmp_store, monkeypatch):
        call_ids = _fill()
        # scope to a call whose chunk lives in the cold tier
        filt = RetrieveFilters(call_ids=[call_ids[-2]])
        expected = [r["retrieved_ids"]
                    for r in _results(filters=filt)]
        _recap(monkeypatch, max_rows=4)
        got = [r["retrieved_ids"] for r in _results(filters=filt)]
        assert got == expected
        assert any(ids for ids in got)  # the scoped cold doc is found

    def test_delete_reaches_cold_rows(self, tmp_store, monkeypatch):
        call_ids = _fill()
        _recap(monkeypatch, max_rows=4)
        index = get_index()
        live_before = index.chunks.live_count
        delete_call(call_ids[-1])  # its chunk is cold
        assert index.chunks.live_count == live_before - 1
        assert index.chunks.cold.tombstones == 1
        ids = [r["retrieved_ids"] for r in _results()]
        flat = {i for ids_q in ids for i in ids_q}
        # the deleted doc (highest chunk id) no longer appears
        assert f"chunk:{len(TEXTS)}" not in flat

    def test_cold_compaction(self, tmp_store, monkeypatch):
        call_ids = _fill()
        _recap(monkeypatch, max_rows=4)
        index = get_index()
        for cid in call_ids[6:]:
            delete_call(cid)
        tier = index.chunks.cold
        assert tier.tombstones > 0
        before_live = tier.live_count
        tier.compact()
        assert tier.count == before_live
        assert tier.tombstones == 0
        # still retrievable after compaction
        assert any(r["retrieved_ids"] for r in _results())

    def test_backfill_embeds_cold_rows(self, tmp_store, monkeypatch):
        monkeypatch.setattr(settings, "index_max_device_rows", 4)
        monkeypatch.setattr(settings, "cold_block_rows", 8)
        reset_index()
        get_index().ensure_call_capacity(256)
        for i, t in enumerate(TEXTS):
            ingest_transcript(
                CallRef(external_id=f"bf-{i}"),
                [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                             text=t)],
                ChunkingOptions(target_tokens=10, max_tokens=40,
                                overlap_tokens=0),
            )
        index = get_index()
        tier = index.chunks.cold
        assert tier.count == len(TEXTS) - 4
        assert tier.emb_rows == 0
        run_embedding_backfill(batch_size=8)
        assert tier.emb_rows == tier.count
        # dense lane now covers cold rows
        resp = _results(queries=["frankfurt eviction kubernetes"])[0]
        assert resp["retrieved_ids"]

    def test_checkpoint_roundtrip_rebuilds_cold(self, tmp_store,
                                                monkeypatch):
        from cadence_rag_tpu.ingest.sync import get_syncer

        _fill()
        expected = [r["retrieved_ids"] for r in _results()]
        _recap(monkeypatch, max_rows=4)
        index = get_index()
        hot_state_chunks = index.chunks.state_arrays()
        hot_state_artifacts = index.artifacts.state_arrays()
        assert hot_state_chunks["ids"].shape[0] == 4  # hot tier only

        reset_index()
        index = get_index()
        index.ensure_call_capacity(256)
        index.chunks.load_state(hot_state_chunks)
        index.artifacts.load_state(hot_state_artifacts)
        # startup reconcile refills the cold tier from the store
        counts = get_syncer().reconcile()
        assert counts["inserted"] == len(TEXTS) - 4
        assert index.chunks.cold.count == len(TEXTS) - 4
        got = [r["retrieved_ids"] for r in _results()]
        assert got == expected

    def test_mesh_combination_refused(self, tmp_store, monkeypatch):
        monkeypatch.setattr(settings, "index_max_device_rows", 4)
        monkeypatch.setattr(settings, "mesh_shape", "data:8")
        reset_index()
        with pytest.raises(RuntimeError, match="mutually exclusive"):
            get_index()


class TestColdTierSync:
    def test_worker_rows_sync_into_cold(self, tmp_store, monkeypatch):
        from cadence_rag_tpu.ingest.ingest import set_store_only
        from cadence_rag_tpu.ingest.sync import get_syncer

        _fill()
        _recap(monkeypatch, max_rows=4)
        syncer = get_syncer()
        syncer.init_watermark()
        set_store_only(True)
        try:
            ingest_transcript(
                CallRef(external_id="worker-cold"),
                [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                             text="replication failover drill for the "
                                  "frankfurt gateway")],
                ChunkingOptions(target_tokens=10, max_tokens=40,
                                overlap_tokens=0),
            )
        finally:
            set_store_only(False)
        index = get_index()
        cold_before = index.chunks.cold.count
        counts = syncer.poll_once()
        assert counts.get("inserted") == 1
        assert index.chunks.cold.count == cold_before + 1
        # second poll must NOT re-insert (presence spans both tiers)
        assert not syncer.poll_once().get("inserted")
        resp = _results(queries=["replication failover drill"])[0]
        assert resp["retrieved_ids"]


class TestSyntheticColdInstaller:
    def test_bulk_cold_rows_are_retrievable(self, tmp_store, monkeypatch):
        """evals/synth.install_synthetic_cold (the vectorized populate
        the 4M beyond-HBM capture uses) must wire ids/stats exactly like
        the DocRow path: a dense probe equal to a cold row's embedding
        retrieves that doc id top-1 through the full dispatch."""
        import numpy as np

        monkeypatch.setattr(tmp_store, "index_max_device_rows", 64)
        monkeypatch.setattr(tmp_store, "cold_block_rows", 128)
        from cadence_rag_tpu.core.index import get_index
        from cadence_rag_tpu.evals.synth import (
            install_synthetic_cold,
            install_synthetic_corpus,
        )

        index = get_index()
        index.ensure_call_capacity(16)
        install_synthetic_corpus(index.chunks, 64, 16, seed=0)
        install_synthetic_corpus(index.artifacts, 16, 16, seed=1)
        install_synthetic_cold(index.chunks, 300, 16, seed=2)
        assert index.chunks.cold is not None
        assert index.chunks.cold.count == 300
        assert index.chunks.live_count == 364

        tier = index.chunks.cold
        pick = 137
        emb = np.asarray(tier.emb[pick], dtype=np.float32)
        emb = emb / max(np.linalg.norm(emb), 1e-9)
        batch = 1
        F = 16
        feats = [(np.zeros(0, np.int64), np.zeros(0, np.float32),
                  np.zeros(0, np.float32))]
        q_tech = np.zeros((batch, index.chunks.tech_slots * 4), np.int32)
        chunks_out, _ = index.query_both_packed(
            emb[None].astype(np.float32), feats, q_tech,
            np.ones((batch, index.call_capacity), bool),
            np.full(batch, -2147483647, np.int32),
            np.full(batch, 2**31 - 1, np.int32),
            chunk_ks=(5, 5, 5), artifact_ks=(2, 2, 5),
            chunk_mode="exact", artifact_mode="exact",
            recall_target=0.95,
        )
        ids, _scores, counts = chunks_out["dense"]
        assert counts[0] >= 1
        assert int(ids[0][0]) == int(tier.ids[pick])
