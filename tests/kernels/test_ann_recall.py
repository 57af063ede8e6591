"""ANN recall gate at CPU-test scale (the 100k TPU run is exercised by
the CLI: python -m cadence_rag_tpu.evals.ann_recall_gate)."""

from cadence_rag_tpu.evals.ann_recall_gate import measure_recall


class TestAnnRecall:
    def test_ann_mode_recall(self):
        result = measure_recall(n=4096, n_queries=16, k=10, mode="ann")
        assert result["recall_at_k"] >= 0.9, result

    def test_ef_search_improves_recall(self):
        low = measure_recall(n=4096, n_queries=16, k=10, ef_search=10)
        high = measure_recall(n=4096, n_queries=16, k=10, ef_search=640)
        assert high["recall_target"] > low["recall_target"]
        assert high["recall_at_k"] >= low["recall_at_k"] - 0.05
