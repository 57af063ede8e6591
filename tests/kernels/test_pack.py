"""Packed single-transfer query path (ops/pack.py) vs the unpacked fused
program: identical lane results — the pack/unpack/bitcast/scatter round
trip must be lossless where it claims to be (buckets, tech, filters exact;
q_emb through f16 transport; lexical values through f16)."""

import jax.numpy as jnp
import numpy as np

from cadence_rag_tpu.ops.fused import dual_corpus_retrieve
from cadence_rag_tpu.ops.hashing import query_feature_arrays
from cadence_rag_tpu.ops.pack import (
    dual_corpus_retrieve_packed,
    pack_queries,
    sparse_lex_rows,
    unflatten_lanes,
)


def _corpus(rng, n, dim, dlex, slots, n_calls):
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return (
        jnp.asarray(emb),
        jnp.asarray(rng.integers(-4, 5, (n, dlex)).astype(np.int8)),
        jnp.asarray(rng.integers(1, 999, (n, slots)).astype(np.int32)),
        jnp.asarray(rng.integers(0, n_calls, n).astype(np.int32)),
        jnp.asarray(rng.integers(1000, 9000, n).astype(np.int32)),
        jnp.asarray(np.ones(n, bool)),
    ), emb


class TestPackedParity:
    def test_matches_unpacked_program(self):
        rng = np.random.default_rng(0)
        n, dim, dlex, slots, n_calls, batch, F = 512, 64, 256, 4, 8, 4, 64
        chunks, chunk_emb = _corpus(rng, n, dim, dlex, slots, n_calls)
        arts, _ = _corpus(rng, n // 4, dim, dlex, slots, n_calls)

        q_emb = chunk_emb[:batch].copy()
        from cadence_rag_tpu.ops.hashing import (
            tech_query_structure_from_hashes as _qs,
        )

        q_tech = np.stack([
            _qs(rng.integers(1, 999, 3).tolist(), slots)
            for _ in range(batch)
        ])
        allowed = rng.random((batch, n_calls)) > 0.2
        dmin = np.full(batch, 0, np.int32)
        dmax = np.full(batch, 2**31 - 1, np.int32)

        # realistic sparse features from real query text
        texts = ["object store rollback v2.3.1 latency",
                 "lenovo bake-off BOM pricing",
                 "azure migration private endpoints",
                 "certificate expired edge 503"]
        feats = [query_feature_arrays(t, dlex) for t in texts]
        doc_freq = rng.integers(1, 100, dlex).astype(np.int64)

        chunk_sparse = sparse_lex_rows(feats, doc_freq, n, F)
        art_sparse = sparse_lex_rows(feats, doc_freq, n // 4, F)

        # the unpacked reference path needs the dense vectors with the
        # SAME f16 value quantization the packed transport applies
        def densify_host(sparse, width):
            buckets, vals = sparse
            out = np.zeros((batch, width), np.float32)
            for b in range(batch):
                np.add.at(out[b], buckets[b].astype(np.int64),
                          vals[b].astype(np.float32))
            return out

        q_emb_f16 = q_emb.astype(np.float16).astype(np.float32)
        dense_chunk = densify_host(chunk_sparse, dlex)
        dense_art = densify_host(art_sparse, dlex)

        ref_chunks, ref_arts = dual_corpus_retrieve(
            chunks, arts,
            jnp.asarray(q_emb_f16), jnp.asarray(dense_chunk),
            jnp.asarray(dense_art), jnp.asarray(q_tech),
            jnp.asarray(allowed), jnp.asarray(dmin), jnp.asarray(dmax),
            chunk_ks=(8, 8, 8), artifact_ks=(4, 4, 4),
            chunk_mode="exact", artifact_mode="exact",
        )
        packed = pack_queries(
            q_emb, chunk_sparse, art_sparse, q_tech, allowed, dmin, dmax
        )
        flat = dual_corpus_retrieve_packed(
            chunks, arts, jnp.asarray(packed),
            batch=batch, emb_dim=dim, q_feats=F, tech_q=q_tech.shape[1],
            n_calls=n_calls,
            chunk_ks=(8, 8, 8), artifact_ks=(4, 4, 4),
            chunk_mode="exact", artifact_mode="exact",
        )
        got_chunks, got_arts = unflatten_lanes(
            np.asarray(flat),
            chunk_ks=(8, 8, 8), artifact_ks=(4, 4, 4),
            chunk_mode="exact", artifact_mode="exact", dense_enabled=True,
        )
        for ref, got in ((ref_chunks, got_chunks), (ref_arts, got_arts)):
            assert set(ref) == set(got)
            for lane in ref:
                r_scores, r_pos = (np.asarray(x) for x in ref[lane])
                g_scores, g_pos = (np.asarray(x) for x in got[lane])
                np.testing.assert_array_equal(g_pos, r_pos, err_msg=lane)
                np.testing.assert_allclose(
                    g_scores, r_scores, rtol=1e-5, err_msg=lane
                )

    def test_dense_disabled(self):
        rng = np.random.default_rng(1)
        n, dim, dlex, slots, n_calls, batch, F = 128, 32, 128, 4, 4, 2, 32
        chunks, _ = _corpus(rng, n, dim, dlex, slots, n_calls)
        arts, _ = _corpus(rng, n // 4, dim, dlex, slots, n_calls)
        feats = [query_feature_arrays("object store", dlex)] * batch
        doc_freq = np.ones(dlex, np.int64)
        sparse = sparse_lex_rows(feats, doc_freq, n, F)
        packed = pack_queries(
            None, sparse, sparse,
            np.zeros((batch, slots), np.int32),
            np.ones((batch, n_calls), bool),
            np.zeros(batch, np.int32),
            np.full(batch, 2**31 - 1, np.int32),
        )
        flat = dual_corpus_retrieve_packed(
            chunks, arts, jnp.asarray(packed),
            batch=batch, emb_dim=1, q_feats=F, tech_q=slots,
            n_calls=n_calls,
            chunk_ks=(8, 8, 8), artifact_ks=(4, 4, 4),
            dense_enabled=False,
        )
        got_chunks, got_arts = unflatten_lanes(
            np.asarray(flat),
            chunk_ks=(8, 8, 8), artifact_ks=(4, 4, 4),
            chunk_mode="exact", artifact_mode="exact", dense_enabled=False,
        )
        assert "dense" not in got_chunks
        assert got_chunks["lex"][0].shape == (batch, 8)

    def test_sparse_overflow_keeps_largest(self):
        # > F features: the lowest-|value| tail drops, top features survive
        text = " ".join(f"word{i}" for i in range(80))
        feats = [query_feature_arrays(text, 4096)]
        doc_freq = np.ones(4096, np.int64)
        buckets, vals = sparse_lex_rows(feats, doc_freq, 1000, F=16)
        assert buckets.shape == (1, 16)
        assert np.count_nonzero(vals) == 16
