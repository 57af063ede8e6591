"""Phase-4 rerank lane: reorders candidates, reports reranked_from, and the
regression gate still passes with rerank enabled (the gating requirement in
BASELINE.md config 5)."""

import numpy as np
import pytest

from cadence_rag_tpu.embed.pipeline import run_embedding_backfill
from cadence_rag_tpu.engine.retrieve import retrieve_evidence
from cadence_rag_tpu.ingest.ingest import ingest_transcript
from cadence_rag_tpu.schemas import CallRef, ChunkingOptions, RetrieveRequest, UtteranceIn


@pytest.fixture()
def corpus(tmp_store):
    texts = [
        "the ECONNRESET issue is resolved by pinning v2.3.1 on the client",
        "unrelated sales chatter about renewals and forecasts today",
        "object store latency improved after SSD tiering rollout",
        "ECONNRESET keeps appearing in the object store gateway logs",
    ]
    ingest_transcript(
        CallRef(external_id="rr-1"),
        [UtteranceIn(speaker="A", start_ts_ms=i * 1000, end_ts_ms=i * 1000 + 900,
                     text=t) for i, t in enumerate(texts)],
        ChunkingOptions(target_tokens=10, max_tokens=30, overlap_tokens=0),
    )
    run_embedding_backfill(batch_size=8)
    return tmp_store


class TestLexicalRerank:
    def test_reranked_from_reported(self, corpus, monkeypatch):
        monkeypatch.setattr(corpus, "rerank_enabled", True)
        resp = retrieve_evidence(RetrieveRequest(query="ECONNRESET object store"))
        assert resp["notes"]["retrieval"]["reranked_from"] >= 1
        assert resp["quotes"]
        # most lexically-relevant chunk leads after rerank
        assert "ECONNRESET" in resp["quotes"][0]["snippet"]

    def test_disabled_by_default(self, corpus):
        resp = retrieve_evidence(RetrieveRequest(query="ECONNRESET"))
        assert resp["notes"]["retrieval"]["reranked_from"] is None

    def test_deterministic(self, corpus, monkeypatch):
        monkeypatch.setattr(corpus, "rerank_enabled", True)
        req = RetrieveRequest(query="SSD tiering latency", return_style="ids_only")
        assert (
            retrieve_evidence(req)["retrieved_ids"]
            == retrieve_evidence(req)["retrieved_ids"]
        )


class TestNeuralRerank:
    def test_neural_provider_runs(self, corpus, monkeypatch):
        monkeypatch.setattr(corpus, "rerank_enabled", True)
        monkeypatch.setattr(corpus, "rerank_provider", "neural")
        resp = retrieve_evidence(RetrieveRequest(query="ECONNRESET object store"))
        assert resp["notes"]["retrieval"]["reranked_from"] >= 1
        assert resp["quotes"]  # random-init logits still produce a full pack


class TestRerankGate:
    def test_regression_gate_passes_with_rerank(self, tmp_path, monkeypatch):
        from cadence_rag_tpu.config import settings
        from cadence_rag_tpu.evals.real_gate import run_gate

        monkeypatch.setattr(settings, "rerank_enabled", True)
        monkeypatch.setattr(settings, "rerank_provider", "lexical")
        outcome = run_gate(store_dir=str(tmp_path / "gate"))
        assert not outcome["failures"], outcome["metrics"]
