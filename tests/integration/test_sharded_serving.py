"""Mesh-sharded serving: with MESH_SHAPE set, the index arrays shard over
the device mesh and the SAME engine path serves queries SPMD — results
must match the unsharded single-device run exactly."""

import numpy as np
import pytest

from cadence_rag_tpu.core.index import get_index, reset_index
from cadence_rag_tpu.embed.pipeline import run_embedding_backfill
from cadence_rag_tpu.engine.retrieve import retrieve_evidence
from cadence_rag_tpu.ingest.ingest import ingest_transcript
from cadence_rag_tpu.schemas import CallRef, ChunkingOptions, RetrieveRequest, UtteranceIn

OPTS = ChunkingOptions(target_tokens=8, max_tokens=20, overlap_tokens=0)

TEXTS = [
    "object store ECONNRESET retries on the gateway",
    "lenovo BOM pricing for the bake-off",
    "azure migration cutover runbook details",
    "SSD tiering latency improvements on ingest",
    "renewal forecast for the emea region",
    "kubernetes upgrade on the staging cluster",
]


def _populate():
    for i, t in enumerate(TEXTS * 3):
        ingest_transcript(
            CallRef(external_id=f"shard-{i}"),
            [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                         text=f"{t} variant {i}")],
            OPTS,
        )
    run_embedding_backfill(batch_size=8)


QUERIES = [
    "ECONNRESET object store gateway",
    "lenovo bake-off pricing",
    "kubernetes staging upgrade",
]


class TestShardedServing:
    def test_sharded_results_match_unsharded(self, tmp_store, monkeypatch):
        import jax

        assert jax.device_count() == 8

        # unsharded baseline
        _populate()
        baseline = [
            retrieve_evidence(
                RetrieveRequest(query=q, return_style="ids_only")
            )["retrieved_ids"]
            for q in QUERIES
        ]

        # fresh index sharded over the 8-device mesh, same store
        monkeypatch.setattr(tmp_store, "mesh_shape", "data:8")
        reset_index()
        from cadence_rag_tpu.ingest.ingest import rebuild_index_from_store

        rebuild_index_from_store()
        index = get_index()
        assert index.mesh is not None
        # the embedding matrix really is sharded across devices
        assert len(index.chunks.emb.sharding.device_set) == 8

        sharded = [
            retrieve_evidence(
                RetrieveRequest(query=q, return_style="ids_only")
            )["retrieved_ids"]
            for q in QUERIES
        ]
        assert sharded == baseline

    def test_sharded_ivf_matches_unsharded(self, tmp_store, monkeypatch):
        """IVF on a single-process GSPMD mesh: k-means build and the
        probed row gather run over the ROW-SHARDED embedding matrix (XLA
        inserts the collectives) and must serve dense_mode=ivf with the
        same results as the unsharded build."""
        monkeypatch.setattr(tmp_store, "dense_ivf_enabled", True)
        monkeypatch.setattr(tmp_store, "ivf_min_rows", 1)

        _populate()
        # a non-empty artifacts corpus keeps the packed path (an empty
        # corpus takes the cold-start fallback, which serves ivf as ann)
        from cadence_rag_tpu.ingest.ingest import ingest_analysis
        from cadence_rag_tpu.schemas import AnalysisArtifactIn

        ingest_analysis(
            CallRef(external_id="shard-0"),
            [AnalysisArtifactIn(kind="summary",
                                content="gateway retries summary")],
        )
        index = get_index()
        index.chunks.build_ivf(n_clusters=4, seed=3)
        assert index.chunks.ivf_usable()
        baseline = [
            retrieve_evidence(
                RetrieveRequest(query=q, return_style="ids_only")
            )["retrieved_ids"]
            for q in QUERIES
        ]

        monkeypatch.setattr(tmp_store, "mesh_shape", "data:8")
        reset_index()
        from cadence_rag_tpu.ingest.ingest import rebuild_index_from_store

        rebuild_index_from_store()
        index = get_index()
        assert index.mesh is not None
        state = index.chunks.build_ivf(n_clusters=4, seed=3)
        assert index.chunks.ivf_usable()
        assert state.n_clusters == 4
        sharded = [
            retrieve_evidence(
                RetrieveRequest(query=q, return_style="ids_only")
            )["retrieved_ids"]
            for q in QUERIES
        ]
        assert sharded == baseline

    def test_sharded_ingest_and_filters(self, tmp_store, monkeypatch):
        monkeypatch.setattr(tmp_store, "mesh_shape", "data:8")
        reset_index()
        _populate()
        index = get_index()
        assert index.mesh is not None
        from cadence_rag_tpu.schemas import RetrieveFilters

        resp = retrieve_evidence(RetrieveRequest(
            query="ECONNRESET object store",
            filters=RetrieveFilters(external_id="shard-0"),
        ))
        assert resp["quotes"]
        call_ids = {q["call_id"] for q in resp["quotes"]}
        assert len(call_ids) == 1


class TestShardedCheckpoint:
    def test_checkpoint_roundtrip_with_mesh(self, tmp_store, tmp_path,
                                            monkeypatch):
        from cadence_rag_tpu.core.checkpoint import restore_index, save_index

        monkeypatch.setattr(tmp_store, "mesh_shape", "data:8")
        reset_index()
        _populate()
        req = RetrieveRequest(query="ECONNRESET object store",
                              return_style="ids_only")
        before = retrieve_evidence(req)["retrieved_ids"]
        save_index(str(tmp_path / "snap"))
        reset_index()
        restore_index(str(tmp_path / "snap"))
        index = get_index()
        assert index.mesh is not None
        assert len(index.chunks.emb.sharding.device_set) == 8
        after = retrieve_evidence(req)["retrieved_ids"]
        assert after == before
