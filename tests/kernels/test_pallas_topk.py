"""Pallas streaming top-k kernel: correctness + recall vs the exact oracle
(interpret mode so the kernel logic runs under CPU tests; the real Mosaic
compile is exercised on TPU by bench/recall gates)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cadence_rag_tpu.ops.pallas_topk import LANE, pallas_cosine_topk
from cadence_rag_tpu.ops.topk import reference_topk_numpy


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestPallasTopk:
    def test_self_match_top1(self):
        rng = np.random.default_rng(0)
        docs = _unit_rows(rng, 2048, 128)
        qs = docs[[3, 700]]
        mask = np.ones((2, 2048), dtype=bool)
        vals, idx = pallas_cosine_topk(
            jnp.asarray(qs), jnp.asarray(docs), jnp.asarray(mask), 5,
            block_n=512, interpret=True,
        )
        assert int(idx[0, 0]) == 3 and int(idx[1, 0]) == 700
        assert float(vals[0, 0]) == pytest.approx(1.0, abs=1e-5)

    def test_recall_vs_exact(self):
        rng = np.random.default_rng(1)
        n, k = 4096, 10
        docs = _unit_rows(rng, n, 64)
        qs = _unit_rows(rng, 4, 64)
        mask = np.ones((4, n), dtype=bool)
        _, ref_idx = reference_topk_numpy(qs, docs, mask, k)
        _, got_idx = pallas_cosine_topk(
            jnp.asarray(qs), jnp.asarray(docs), jnp.asarray(mask), k,
            block_n=512, interpret=True,
        )
        recalls = [
            len(set(map(int, got_idx[b])) & set(map(int, ref_idx[b]))) / k
            for b in range(4)
        ]
        # k << n/LANE=32 is violated here (k=10 vs 32 groups); still expect
        # high overlap on random data
        assert np.mean(recalls) >= 0.8, recalls

    def test_mask_respected(self):
        rng = np.random.default_rng(2)
        docs = _unit_rows(rng, 1024, 32)
        qs = docs[[5]]
        mask = np.ones((1, 1024), dtype=bool)
        mask[0, 5] = False  # exclude the self-match
        _, idx = pallas_cosine_topk(
            jnp.asarray(qs), jnp.asarray(docs), jnp.asarray(mask), 3,
            block_n=256, interpret=True,
        )
        assert 5 not in set(map(int, idx[0]))

    def test_candidate_index_mapping(self):
        """Winner indices must be correct global doc positions."""
        rng = np.random.default_rng(3)
        n = 1024
        docs = _unit_rows(rng, n, 32)
        qs = _unit_rows(rng, 2, 32)
        mask = np.ones((2, n), dtype=bool)
        vals, idx = pallas_cosine_topk(
            jnp.asarray(qs), jnp.asarray(docs), jnp.asarray(mask), 8,
            block_n=256, interpret=True,
        )
        scores = qs @ docs.T
        for b in range(2):
            for v, i in zip(np.asarray(vals[b]), np.asarray(idx[b])):
                assert scores[b, int(i)] == pytest.approx(float(v), abs=1e-5)
