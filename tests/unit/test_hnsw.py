"""Native HNSW: build + search recall vs exact scan, ef_search knob."""

import numpy as np
import pytest

from cadence_rag_tpu.native import hnsw


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.skipif(not hnsw.available(), reason="no native toolchain")
class TestHnsw:
    def test_self_match(self):
        rng = np.random.default_rng(0)
        docs = _unit_rows(rng, 2000, 64)
        index = hnsw.HnswIndex(docs, m=16, ef_construction=64)
        sims, idx = index.search(docs[[17, 911]], k=1, ef_search=40)
        assert list(idx[:, 0]) == [17, 911]
        np.testing.assert_allclose(sims[:, 0], 1.0, atol=1e-5)

    def test_recall_at_10_uniform_data(self):
        # uniform random vectors: the adversarial no-structure case
        rng = np.random.default_rng(1)
        n, k = 8000, 10
        docs = _unit_rows(rng, n, 64)
        queries = _unit_rows(rng, 16, 64)
        index = hnsw.HnswIndex(docs, m=16, ef_construction=64)
        exact = np.argsort(-(queries @ docs.T), axis=1)[:, :k]
        _, got = index.search(queries, k=k, ef_search=80)
        recall = np.mean([
            len(set(map(int, got[b])) & set(map(int, exact[b]))) / k
            for b in range(queries.shape[0])
        ])
        assert recall >= 0.80, recall

    def test_recall_at_10_clustered_data(self):
        # topic-clustered vectors (how real embeddings distribute)
        rng = np.random.default_rng(4)
        n, k, dim = 8000, 10, 64
        centers = _unit_rows(rng, 120, dim)
        assign = rng.integers(0, 120, size=n)
        docs = centers[assign] + 0.08 * rng.standard_normal((n, dim)).astype(
            np.float32
        )
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        q_idx = rng.choice(n, size=16, replace=False)
        queries = docs[q_idx] + 0.05 * rng.standard_normal(
            (16, dim)
        ).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        index = hnsw.HnswIndex(docs, m=16, ef_construction=64)
        exact = np.argsort(-(queries @ docs.T), axis=1)[:, :k]
        _, got = index.search(queries, k=k, ef_search=80)
        recall = np.mean([
            len(set(map(int, got[b])) & set(map(int, exact[b]))) / k
            for b in range(16)
        ])
        assert recall >= 0.95, recall

    def test_ef_search_improves_recall(self):
        rng = np.random.default_rng(2)
        n, k = 6000, 10
        docs = _unit_rows(rng, n, 32)
        queries = _unit_rows(rng, 12, 32)
        index = hnsw.HnswIndex(docs, m=12, ef_construction=48)
        exact = np.argsort(-(queries @ docs.T), axis=1)[:, :k]

        def recall(ef):
            _, got = index.search(queries, k=k, ef_search=ef)
            return np.mean([
                len(set(map(int, got[b])) & set(map(int, exact[b]))) / k
                for b in range(queries.shape[0])
            ])

        assert recall(128) >= recall(8) - 0.02

    def test_graph_has_levels(self):
        rng = np.random.default_rng(3)
        docs = _unit_rows(rng, 4000, 16)
        index = hnsw.HnswIndex(docs, m=8)
        assert index.max_level >= 1
