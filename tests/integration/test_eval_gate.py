"""Eval harness tests: metric formulas + the end-to-end gate
(coverage model: the reference runs its gate as a CLI; we additionally pin
it as a test so retrieval-quality regressions fail CI — SURVEY.md §4
'metric-gated eval as a test')."""

import pytest

from cadence_rag_tpu.evals.gate import evaluate_gate
from cadence_rag_tpu.evals.metrics import compute_metrics
from cadence_rag_tpu.evals.real_gate import run_gate


class TestMetrics:
    def test_perfect_retrieval(self):
        gold = {"q1": ["a", "b"]}
        results = {"q1": ["a", "b", "c"]}
        m = compute_metrics(gold, results, ks=(5,))
        assert m["mrr"] == 1.0
        assert m["recall@5"] == 1.0
        assert m["ndcg@5"] == pytest.approx(1.0)

    def test_miss(self):
        m = compute_metrics({"q": ["a"]}, {"q": ["x", "y"]}, ks=(5,))
        assert m["mrr"] == 0.0 and m["recall@5"] == 0.0

    def test_rank_two(self):
        m = compute_metrics({"q": ["a"]}, {"q": ["x", "a"]}, ks=(1, 5))
        assert m["mrr"] == 0.5
        assert m["recall@1"] == 0.0 and m["recall@5"] == 1.0

    def test_macro_average_skips_empty_gold(self):
        gold = {"q1": ["a"], "q2": []}
        results = {"q1": ["a"]}
        m = compute_metrics(gold, results, ks=(5,))
        assert m["mrr"] == 1.0  # q2 not counted

    def test_gate_thresholds(self):
        gold = {"q": ["a"]}
        results = {"q": ["a"]}
        _metrics, failures = evaluate_gate(gold, results)
        assert failures == []
        _metrics, failures = evaluate_gate(
            gold, {"q": ["x"]}, min_mrr=0.5
        )
        assert failures


class TestRealGate:
    def test_end_to_end_gate_passes(self, tmp_path):
        outcome = run_gate(store_dir=str(tmp_path / "gate"))
        assert not outcome["failures"], (
            outcome["failures"], outcome["metrics"]
        )
        # quality well above the floors, not scraping by
        assert outcome["metrics"]["mrr"] >= 0.8
        assert outcome["metrics"]["recall@20"] >= 0.9

    def test_end_to_end_gate_passes_with_vocab_head(self, tmp_path):
        """Retrieval quality holds with the learned lexical vocab head
        active (core/vocab.py): the gate ingests, builds+applies the
        head, then runs the same gold queries through the batched path."""
        outcome = run_gate(
            store_dir=str(tmp_path / "gate_vocab"), build_vocab=True
        )
        assert not outcome["failures"], (
            outcome["failures"], outcome["metrics"]
        )
        assert outcome["metrics"]["mrr"] >= 0.8
        assert outcome["metrics"]["recall@20"] >= 0.9
