"""Eval harness: retrieval quality metrics, threshold gates, and the
end-to-end regression gate over a disposable store+index
(reference: eval/run_eval.py, eval/regression_gate.py,
eval/run_real_regression_gate.py)."""

from .metrics import compute_metrics, dcg  # noqa: F401
