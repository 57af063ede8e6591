"""IVF index: device k-means build, padded buckets, probed query recall."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_rag_tpu.ops.ivf import build_buckets, ivf_topk, kmeans
from cadence_rag_tpu.ops.topk import reference_topk_numpy


def _clustered_corpus(rng, n_clusters, per_cluster, dim):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    docs = np.repeat(centers, per_cluster, axis=0)
    docs += 0.15 * rng.standard_normal(docs.shape).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    return docs


class TestKmeans:
    def test_recovers_cluster_structure(self):
        rng = np.random.default_rng(0)
        docs = _clustered_corpus(rng, 8, 64, 32)
        centroids, assign = kmeans(
            jnp.asarray(docs), jax.random.PRNGKey(0), n_clusters=8, iters=15
        )
        assign = np.asarray(assign)
        # points generated from the same center should mostly co-cluster
        agree = 0
        for g in range(8):
            block = assign[g * 64 : (g + 1) * 64]
            agree += np.max(np.bincount(block, minlength=8))
        assert agree / docs.shape[0] > 0.85

    def test_centroids_unit_norm(self):
        rng = np.random.default_rng(1)
        docs = _clustered_corpus(rng, 4, 32, 16)
        centroids, _ = kmeans(
            jnp.asarray(docs), jax.random.PRNGKey(1), n_clusters=4, iters=5
        )
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(centroids), axis=1), 1.0, atol=1e-4
        )


class TestBuckets:
    def test_packing_and_overflow(self):
        assign = np.array([0, 0, 0, 1, 1, 2], dtype=np.int32)
        buckets, overflow = build_buckets(assign, 3, bucket_cap=2)
        assert set(buckets[0]) <= {0, 1, 2}
        assert (buckets[0] >= 0).sum() == 2
        assert len(overflow) == 1 and int(overflow[0]) in (0, 1, 2)
        assert buckets[2, 0] == 5 and buckets[2, 1] == -1


class TestIvfQuery:
    def test_recall_vs_exact(self):
        rng = np.random.default_rng(2)
        n_clusters, per = 16, 128
        docs = _clustered_corpus(rng, n_clusters, per, 32)
        n = docs.shape[0]
        centroids, assign = kmeans(
            jnp.asarray(docs), jax.random.PRNGKey(2),
            n_clusters=n_clusters, iters=12,
        )
        buckets, overflow = build_buckets(
            np.asarray(assign), n_clusters, bucket_cap=per * 2
        )
        if len(overflow) == 0:
            overflow = np.full(8, -1, dtype=np.int32)
        qs = docs[rng.choice(n, size=8, replace=False)]
        mask = np.ones((8, n), dtype=bool)
        k = 10
        _, ref_idx = reference_topk_numpy(qs, docs, mask, k)
        scores, pos = ivf_topk(
            jnp.asarray(qs), jnp.asarray(docs), centroids,
            jnp.asarray(buckets), jnp.asarray(overflow), jnp.asarray(mask),
            k=k, nprobe=4,
        )
        pos = np.asarray(pos)
        recall = np.mean([
            len(set(map(int, pos[b])) & set(map(int, ref_idx[b]))) / k
            for b in range(8)
        ])
        assert recall >= 0.9, recall

    def test_mask_and_padding(self):
        rng = np.random.default_rng(3)
        docs = _clustered_corpus(rng, 4, 32, 16)
        n = docs.shape[0]
        centroids, assign = kmeans(
            jnp.asarray(docs), jax.random.PRNGKey(3), n_clusters=4, iters=8
        )
        buckets, overflow = build_buckets(np.asarray(assign), 4, bucket_cap=64)
        if len(overflow) == 0:
            overflow = np.full(4, -1, dtype=np.int32)
        qs = docs[[0]]
        mask = np.zeros((1, n), dtype=bool)
        mask[0, 10:20] = True
        scores, pos = ivf_topk(
            jnp.asarray(qs), jnp.asarray(docs), centroids,
            jnp.asarray(buckets), jnp.asarray(overflow), jnp.asarray(mask),
            k=5, nprobe=4,
        )
        for p, s in zip(np.asarray(pos)[0], np.asarray(scores)[0]):
            if p >= 0 and np.isfinite(s):
                assert 10 <= p < 20

    def test_k_larger_than_candidate_set(self):
        """A tiny IVF config (few clusters, small bucket_cap) can make the
        probed candidate axis shorter than k; outputs must still be (B, k),
        padded with -1/NEG_INF, and the trace must not fail."""
        rng = np.random.default_rng(4)
        docs = _clustered_corpus(rng, 2, 8, 16)
        n = docs.shape[0]
        centroids, assign = kmeans(
            jnp.asarray(docs), jax.random.PRNGKey(4), n_clusters=2, iters=5
        )
        buckets, overflow = build_buckets(np.asarray(assign), 2, bucket_cap=4)
        if len(overflow) == 0:
            overflow = np.full(2, -1, dtype=np.int32)
        qs = docs[[0]]
        mask = np.ones((1, n), dtype=bool)
        k = 50  # > nprobe*bucket_cap + overflow
        scores, pos = ivf_topk(
            jnp.asarray(qs), jnp.asarray(docs), centroids,
            jnp.asarray(buckets), jnp.asarray(overflow), jnp.asarray(mask),
            k=k, nprobe=1,
        )
        scores, pos = np.asarray(scores), np.asarray(pos)
        assert scores.shape == (1, k) and pos.shape == (1, k)
        valid = np.isfinite(scores[0])
        assert valid.any(), "real hits must survive"
        assert (pos[0][~valid] == -1).all(), "padding must be -1"
        # nprobe exceeding the cluster count also clamps instead of tracing
        scores2, pos2 = ivf_topk(
            jnp.asarray(qs), jnp.asarray(docs), centroids,
            jnp.asarray(buckets), jnp.asarray(overflow), jnp.asarray(mask),
            k=5, nprobe=16,
        )
        assert np.asarray(scores2).shape == (1, 5)


class TestIvfInt8:
    def test_int8_storage_recall_and_scale(self):
        """IVF under INDEX_EMBEDDING_DTYPE=int8: k-means clusters the
        DEQUANTIZED rows (core/index.build_ivf); the probed scan gathers
        raw int8 rows and rescales scores by 1/127 so they share the
        exact/ann lanes' cosine scale."""
        rng = np.random.default_rng(5)
        docs = _clustered_corpus(rng, 16, 128, 32)
        q8 = np.clip(np.rint(docs * 127.0), -127, 127).astype(np.int8)
        deq = q8.astype(np.float32) / 127.0
        n = docs.shape[0]
        centroids, assign = kmeans(
            jnp.asarray(deq), jax.random.PRNGKey(5), n_clusters=16, iters=12
        )
        buckets, overflow = build_buckets(np.asarray(assign), 16,
                                          bucket_cap=256)
        if len(overflow) == 0:
            overflow = np.full(8, -1, dtype=np.int32)
        qs = docs[rng.choice(n, size=8, replace=False)]
        mask = np.ones((8, n), dtype=bool)
        k = 10
        _, ref_idx = reference_topk_numpy(qs, docs, mask, k)
        scores, pos = ivf_topk(
            jnp.asarray(qs), jnp.asarray(q8), centroids,
            jnp.asarray(buckets), jnp.asarray(overflow), jnp.asarray(mask),
            k=k, nprobe=4,
        )
        pos = np.asarray(pos)
        recall = np.mean([
            len(set(map(int, pos[b])) & set(map(int, ref_idx[b]))) / k
            for b in range(8)
        ])
        assert recall >= 0.9, recall
        # scores are in cosine scale (unit-ish), not the raw int8 scale
        assert float(np.asarray(scores)[:, 0].max()) < 2.0
        assert float(np.asarray(scores)[:, 0].min()) > 0.5
