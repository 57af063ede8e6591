"""Capacity growth: inserts beyond the padded capacity must double the
buffers, preserve existing rows, and keep queries correct (the static-shape
vs incremental-ingest tension, SURVEY.md §7)."""

import numpy as np

from cadence_rag_tpu.core.index import CorpusIndex, DocRow


def _row(doc_id, dim=16, lex_dim=64, slots=4, started=1000):
    rng = np.random.default_rng(doc_id)
    emb = rng.standard_normal(dim).astype(np.float32)
    emb /= np.linalg.norm(emb)
    sig = rng.integers(-3, 4, size=lex_dim).astype(np.int8)
    return DocRow(
        doc_id=doc_id,
        call_seq=doc_id % 4,
        started_sec=started + doc_id,
        lex_sig=sig,
        lex_dl=10,
        lex_touched=np.flatnonzero(sig).astype(np.int32),
        tech=np.zeros(slots, dtype=np.int32),
        embedding=emb,
    )


class TestCapacityGrowth:
    def test_growth_preserves_rows_and_queries(self, tmp_store):
        corpus = CorpusIndex(
            "chunks", dim=16, lex_dim=64, tech_slots=4, capacity=8,
            emb_dtype="float32",
        )
        rows = [_row(i) for i in range(1, 101)]  # 100 rows >> capacity 8
        corpus.insert(rows[:5])
        assert corpus.capacity == 8
        corpus.insert(rows[5:])
        assert corpus.count == 100
        assert corpus.capacity >= 100
        np.testing.assert_array_equal(
            corpus.h_ids[:100], np.arange(1, 101)
        )
        # query: each doc's own embedding must retrieve itself first
        probe = np.stack([np.asarray(corpus.emb[i]) for i in (0, 42, 99)])
        out = corpus.query(
            probe.astype(np.float32),
            np.zeros((3, 64), np.float32),
            np.zeros((3, 4), np.int32),
            np.ones((3, 8), bool),
            np.zeros(3, np.int32),
            np.full(3, 2**31 - 1, np.int32),
            k_dense=3, k_lex=3, k_tech=3,
        )
        ids, _scores, counts = out["dense"]
        assert counts.min() >= 1
        assert [int(ids[i][0]) for i in range(3)] == [1, 43, 100]

    def test_growth_in_one_big_insert(self, tmp_store):
        corpus = CorpusIndex(
            "chunks", dim=16, lex_dim=64, tech_slots=4, capacity=8,
            emb_dtype="float32",
        )
        corpus.insert([_row(i) for i in range(1, 65)])
        assert corpus.count == 64 and corpus.capacity == 64
