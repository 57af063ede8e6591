"""Adaptive embedding pipeline unit tests (coverage model: reference
tests/unit/test_embedding_pipeline.py — limit parsing from provider error
text, downshift call sequence, single-row failure, preconditions)."""

import pytest

from cadence_rag_tpu.embed.pipeline import (
    embed_texts_adaptive,
    infer_batch_size_limit,
    run_embedding_backfill,
)
from cadence_rag_tpu.embed.provider import EmbeddingError, EmbeddingResult


class TestInferBatchLimit:
    def test_triton_style_message(self):
        assert infer_batch_size_limit(
            "inference request batch-size must be <= 8"
        ) == 8

    def test_max_batch_phrase(self):
        assert infer_batch_size_limit("maximum batch size is 4 for model") == 4

    def test_no_limit_in_message(self):
        assert infer_batch_size_limit("internal server error") is None
        assert infer_batch_size_limit("") is None


class TestAdaptiveDownshift:
    def test_downshift_sequence_from_error(self, tmp_store, monkeypatch):
        calls = []

        def fake_embed(texts):
            calls.append(len(texts))
            if len(texts) > 2:
                raise EmbeddingError("max batch size 2 exceeded")
            return EmbeddingResult([[0.0] * 4] * len(texts), "fake")

        monkeypatch.setattr(
            "cadence_rag_tpu.embed.pipeline.embed_texts", fake_embed
        )
        result = embed_texts_adaptive(["a", "b", "c", "d", "e"], batch_size=5)
        assert len(result.vectors) == 5
        # 5 fails -> limit parsed as 2 -> 2,2,1 succeed
        assert calls == [5, 2, 2, 1]

    def test_halving_when_no_limit_in_error(self, tmp_store, monkeypatch):
        calls = []

        def fake_embed(texts):
            calls.append(len(texts))
            if len(texts) > 1:
                raise EmbeddingError("opaque failure")
            return EmbeddingResult([[0.0] * 4], "fake")

        monkeypatch.setattr(
            "cadence_rag_tpu.embed.pipeline.embed_texts", fake_embed
        )
        result = embed_texts_adaptive(["a", "b", "c", "d"], batch_size=4)
        assert len(result.vectors) == 4
        assert calls == [4, 2, 1, 1, 1, 1]

    def test_single_row_failure_raises(self, tmp_store, monkeypatch):
        def fake_embed(texts):
            raise EmbeddingError("hard failure")

        monkeypatch.setattr(
            "cadence_rag_tpu.embed.pipeline.embed_texts", fake_embed
        )
        with pytest.raises(EmbeddingError, match="hard failure"):
            embed_texts_adaptive(["only one"], batch_size=4)

    def test_empty_texts_rejected(self, tmp_store):
        with pytest.raises(EmbeddingError, match="non-empty"):
            embed_texts_adaptive(["   ", ""], batch_size=4)


class TestBackfillPreconditions:
    def test_requires_provider(self, tmp_store, monkeypatch):
        monkeypatch.setattr(tmp_store, "embeddings_provider", "")
        monkeypatch.setattr(tmp_store, "embeddings_base_url", "")
        with pytest.raises(RuntimeError, match="provider"):
            run_embedding_backfill(batch_size=4)

    def test_requires_positive_batch(self, tmp_store):
        with pytest.raises(RuntimeError, match="BATCH_SIZE"):
            run_embedding_backfill(batch_size=0)


class TestLexicalFidelity:
    def test_hashing_tracks_collision_free_bm25(self):
        """Fidelity floor: at D=2048 the hashed lane must keep >=0.6 top-10
        overlap and >=0.8 top-1 agreement with collision-free feature BM25
        (evals/lexical_fidelity.py measured 0.77/0.92 at this setting)."""
        from cadence_rag_tpu.evals.lexical_fidelity import measure_fidelity

        result = measure_fidelity(
            n_docs=400, n_queries=24, k=10, dims=[2048]
        )
        stats = result["overlap_at_k"]["2048"]
        assert stats["vs_feature_bm25"] >= 0.6, stats
        assert stats["top1_vs_feature"] >= 0.8, stats


class TestWhitespaceOnlyRows:
    def test_newline_only_text_cannot_wedge_backfill(self, tmp_store):
        """SQLite trim() strips only spaces, so a '\\n'-only text passes
        the SQL pending filter but Python-strips to empty — the old path
        produced fewer vectors than rows and crashed EVERY subsequent
        backfill at the same page. Such rows now get a zero vector and
        leave the pending set (review finding)."""
        from cadence_rag_tpu.ingest.ingest import ingest_transcript
        from cadence_rag_tpu.schemas import (
            CallRef,
            ChunkingOptions,
            UtteranceIn,
        )
        from cadence_rag_tpu.store.db import get_store

        ingest_transcript(
            CallRef(external_id="ws-1"),
            [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                         text="kafka lag resolved after the rebalance")],
            ChunkingOptions(target_tokens=10, max_tokens=30,
                            overlap_tokens=0),
        )
        store = get_store()
        with store.tx() as conn:
            row = conn.execute(
                "SELECT chunk_id FROM chunks LIMIT 1"
            ).fetchone()
            # simulate a writer that stored a newline-only text
            conn.execute(
                "UPDATE chunks SET text=? WHERE chunk_id=?",
                ("\n", int(row["chunk_id"])),
            )
        summary = run_embedding_backfill(batch_size=8)
        assert summary.rows_updated >= 1
        with store.read() as conn:
            pending = conn.execute(
                "SELECT COUNT(*) FROM chunks WHERE embedding IS NULL"
            ).fetchone()[0]
        assert pending == 0
        # second run is a no-op, not a crash
        again = run_embedding_backfill(batch_size=8)
        assert again.rows_updated == 0
