"""Reranker distillation: lexical teacher -> neural cross-encoder
(VERDICT round-1 item 9; BASELINE.md config 5 Phase-4 lane)."""

import numpy as np
import pytest

from cadence_rag_tpu.embed.pipeline import run_embedding_backfill
from cadence_rag_tpu.ingest.ingest import ingest_transcript
from cadence_rag_tpu.schemas import CallRef, ChunkingOptions, RetrieveRequest, UtteranceIn
from cadence_rag_tpu.scripts.train_reranker import (
    build_triples,
    pairwise_agreement,
    train,
)

TOPICS = [
    "object store tiering to SSD cut the tail latency",
    "ECONNRESET storm traced to the gateway upgrade",
    "lenovo BOM finalized before the dell bake-off",
    "azure migration needs private endpoints for cutover",
    "certificate expiry caused the HTTP 503 errors",
    "quota exhaustion throttled the export pipeline",
]


@pytest.fixture()
def corpus(tmp_store):
    for c in range(6):
        texts = [
            f"{TOPICS[(c + j) % len(TOPICS)]} variant {c}-{j} with "
            f"v{c}.{j}.0 details"
            for j in range(4)
        ]
        ingest_transcript(
            CallRef(external_id=f"rr-{c}"),
            [UtteranceIn(speaker="A", start_ts_ms=j * 1000,
                         end_ts_ms=j * 1000 + 900, text=t)
             for j, t in enumerate(texts)],
            ChunkingOptions(target_tokens=12, max_tokens=30, overlap_tokens=0),
        )
    run_embedding_backfill(batch_size=16)
    return tmp_store


class TestDistillation:
    def test_triples_have_teacher_margin(self, corpus):
        triples = build_triples(30, seed=0)
        assert len(triples) >= 16
        for query, hi, lo in triples:
            assert query and hi and lo and hi != lo

    def test_distilled_ordering_beats_random(self, corpus, tmp_path):
        triples = build_triples(60, seed=0)
        holdout = triples[: len(triples) // 5]
        train_set = triples[len(holdout):]
        out = str(tmp_path / "rr.npz")
        # convergence reference (measured): d128/2L @600 steps reaches
        # holdout agreement 0.706; the CI budget trains shorter and gates
        # on clearly-above-random (0.5) ordering transfer
        train(
            train_set, out_path=out, steps=250, batch=16, lr=3e-4,
            d_model=128, n_layers=2, vocab_buckets=4096, max_len=64,
        )
        fidelity = pairwise_agreement(holdout, out)
        assert fidelity >= 0.62, fidelity

    def test_neural_rerank_with_tuned_weights_serves(self, corpus, tmp_path,
                                                     monkeypatch):
        """rerank_provider=neural (banded hybrid) with distilled weights:
        the full engine path works and the pack is non-empty (order-only
        rerank keeps the RRF ladder, so budgets/interleave semantics
        hold)."""
        triples = build_triples(40, seed=1)
        out = str(tmp_path / "rr.npz")
        train(
            triples, out_path=out, steps=30, batch=16, lr=1e-3,
            d_model=64, n_layers=1, vocab_buckets=4096, max_len=64,
        )
        from cadence_rag_tpu.engine.retrieve import retrieve_evidence
        from cadence_rag_tpu.models.reranker import NeuralReranker

        monkeypatch.setattr(corpus, "rerank_enabled", True)
        monkeypatch.setattr(corpus, "reranker_params_path", out)
        try:
            for provider in ("neural", "neural_raw"):
                monkeypatch.setattr(corpus, "rerank_provider", provider)
                NeuralReranker.reset()
                resp = retrieve_evidence(
                    RetrieveRequest(query="ECONNRESET gateway upgrade")
                )
                assert resp["quotes"], provider
                assert resp["notes"]["retrieval"]["reranked_from"] is not None
        finally:
            NeuralReranker.reset()

    def test_hybrid_band_preserves_teacher_order(self, corpus, tmp_path,
                                                 monkeypatch):
        """The banded hybrid can only reorder WITHIN a teacher band: any
        pair the teacher separates by more than TEACHER_BAND keeps its
        relative order regardless of what the neural model says."""
        import numpy as np

        from cadence_rag_tpu.core.index import get_index
        from cadence_rag_tpu.engine.rerank import (
            TEACHER_BAND,
            _lexical_scores,
            rerank,
        )
        from cadence_rag_tpu.models.reranker import NeuralReranker
        from cadence_rag_tpu.store.db import get_store

        with get_store().read() as conn:
            rows = conn.execute(
                "SELECT chunk_id FROM chunks LIMIT 10"
            ).fetchall()
        doc_ids = [int(r["chunk_id"]) for r in rows]
        index = get_index()
        query = "ECONNRESET storm gateway upgrade"
        teacher = _lexical_scores(
            query, "chunks", "chunk_id", "text", doc_ids,
            index.chunks.doc_freq, index.chunks.count,
        )
        monkeypatch.setattr(corpus, "rerank_enabled", True)
        monkeypatch.setattr(corpus, "rerank_provider", "neural")
        monkeypatch.setattr(corpus, "reranker_params_path", "")
        NeuralReranker.reset()  # random weights: adversarial tie-breaker
        try:
            ranked = [(d, {"bm25"}, 1.0 / (60 + i))
                      for i, d in enumerate(doc_ids)]
            out = rerank(
                query, ranked, "chunks",
                index.chunks.doc_freq, index.chunks.count,
                topk=len(doc_ids), provider="neural",
            )
            order = [d for d, _, _ in out]
            for i, a in enumerate(order):
                for b in order[i + 1:]:
                    # b ranked below a => teacher must not prefer b by
                    # more than one band
                    assert teacher.get(b, 0) - teacher.get(a, 0) \
                        < 2 * TEACHER_BAND, (a, b)
        finally:
            NeuralReranker.reset()
