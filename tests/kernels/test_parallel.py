"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: 'multi-device sharding tests ... mesh over fake devices')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_rag_tpu.parallel.mesh import make_mesh, parse_mesh_shape
from cadence_rag_tpu.parallel.sharded import sharded_dense_topk, sharded_multi_lane
from cadence_rag_tpu.ops.fused import multi_lane_retrieve
from cadence_rag_tpu.ops.topk import reference_topk_numpy


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestMesh:
    def test_parse(self):
        assert parse_mesh_shape("data:4,model:2") == [("data", 4), ("model", 2)]

    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == jax.device_count()

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            make_mesh("data:3")  # 8 devices not divisible


class TestShardedTopk:
    def test_matches_single_device_oracle(self):
        assert jax.device_count() == 8
        mesh = make_mesh("data:8")
        rng = np.random.default_rng(0)
        n, dim, batch, k = 512, 64, 4, 10
        emb = _unit_rows(rng, n, dim)
        qs = _unit_rows(rng, batch, dim)
        call_idx = np.zeros(n, dtype=np.int32)
        started = np.full(n, 1000, dtype=np.int32)
        allowed = np.ones((batch, 8), dtype=bool)
        ref_scores, ref_idx = reference_topk_numpy(
            qs, emb, np.ones((batch, n), bool), k
        )
        scores, pos = sharded_dense_topk(
            mesh,
            jnp.asarray(emb), jnp.asarray(call_idx), jnp.asarray(started),
            jnp.asarray(qs), jnp.asarray(allowed),
            jnp.full((batch,), 0, jnp.int32),
            jnp.full((batch,), 2**31 - 1, jnp.int32),
            k,
        )
        # same candidate sets and scores (order may differ on exact ties)
        for b in range(batch):
            assert set(map(int, np.asarray(pos)[b])) == set(map(int, ref_idx[b]))
        np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5)

    def test_filters_respected_across_shards(self):
        mesh = make_mesh("data:8")
        rng = np.random.default_rng(1)
        n, dim = 256, 32
        emb = _unit_rows(rng, n, dim)
        call_idx = (np.arange(n) % 4).astype(np.int32)
        started = np.full(n, 500, dtype=np.int32)
        qs = _unit_rows(rng, 1, dim)
        allowed = np.zeros((1, 4), dtype=bool)
        allowed[0, 2] = True
        scores, pos = sharded_dense_topk(
            mesh,
            jnp.asarray(emb), jnp.asarray(call_idx), jnp.asarray(started),
            jnp.asarray(qs), jnp.asarray(allowed),
            jnp.asarray([0], jnp.int32), jnp.asarray([2**31 - 1], jnp.int32),
            8,
        )
        pos = np.asarray(pos)[0]
        scores = np.asarray(scores)[0]
        for p, s in zip(pos, scores):
            if np.isfinite(s):
                assert call_idx[p] == 2


class TestShardedMultiLane:
    def test_matches_single_device_fused(self):
        mesh = make_mesh("data:8")
        rng = np.random.default_rng(5)
        n, dim, dlex, s, batch = 512, 64, 256, 4, 2
        emb = _unit_rows(rng, n, dim)
        lex = rng.integers(-4, 5, size=(n, dlex)).astype(np.int8)
        tech = np.zeros((n, s), dtype=np.int32)
        tech[::7, 0] = 99
        call_idx = (np.arange(n) % 16).astype(np.int32)
        started = rng.integers(1000, 5000, size=n).astype(np.int32)
        q_emb = _unit_rows(rng, batch, dim)
        q_lex = (rng.standard_normal((batch, dlex)) * 0.1).astype(np.float32)
        from cadence_rag_tpu.ops.hashing import (
            tech_query_structure_from_hashes as _qs,
        )

        q_tech = np.stack([_qs([99], s) for _ in range(batch)])
        allowed = np.ones((batch, 16), dtype=bool)
        dmin = np.zeros(batch, np.int32)
        dmax = np.full(batch, 2**31 - 1, np.int32)

        single = multi_lane_retrieve(
            jnp.asarray(emb), jnp.asarray(lex), jnp.asarray(tech),
            jnp.asarray(call_idx), jnp.asarray(started),
            jnp.ones(n, dtype=bool),
            jnp.asarray(q_emb), jnp.asarray(q_lex), jnp.asarray(q_tech),
            jnp.asarray(allowed), jnp.asarray(dmin), jnp.asarray(dmax),
            k_dense=8, k_lex=8, k_tech=8,
        )
        sharded = sharded_multi_lane(
            mesh,
            jnp.asarray(emb), jnp.asarray(lex), jnp.asarray(tech),
            jnp.asarray(call_idx), jnp.asarray(started),
            jnp.ones(n, dtype=bool),
            jnp.asarray(q_emb), jnp.asarray(q_lex), jnp.asarray(q_tech),
            jnp.asarray(allowed), jnp.asarray(dmin), jnp.asarray(dmax),
            k_dense=8, k_lex=8, k_tech=8,
        )
        for lane in ("dense", "lex", "tech"):
            s_scores, s_pos = (np.asarray(x) for x in single[lane])
            m_scores, m_pos = (np.asarray(x) for x in sharded[lane])
            for b in range(batch):
                # same candidate sets (order can differ on exact ties)
                s_set = {
                    int(p) for p, v in zip(s_pos[b], s_scores[b])
                    if np.isfinite(v)
                }
                m_set = {
                    int(p) for p, v in zip(m_pos[b], m_scores[b])
                    if np.isfinite(v)
                }
                assert m_set == s_set, (lane, b)

    def test_dense_lane_excludes_rows_without_embeddings(self):
        """`embedding IS NOT NULL` parity in the shard_map path: rows whose
        has_emb flag is false must never enter dense top-k (they have
        zero-vector embeddings that would otherwise rank)."""
        mesh = make_mesh("data:8")
        rng = np.random.default_rng(9)
        n, dim = 128, 32
        emb = _unit_rows(rng, n, dim)
        has_emb = np.ones(n, dtype=bool)
        has_emb[::3] = False
        emb[~has_emb] = 0.0
        q_emb = _unit_rows(rng, 1, dim)
        lanes = sharded_multi_lane(
            mesh,
            jnp.asarray(emb),
            jnp.asarray(rng.integers(-3, 4, size=(n, 64)).astype(np.int8)),
            jnp.zeros((n, 2), jnp.int32),
            jnp.zeros(n, jnp.int32),
            jnp.full(n, 1000, jnp.int32),
            jnp.asarray(has_emb),
            jnp.asarray(q_emb),
            jnp.zeros((1, 64), jnp.float32),
            jnp.zeros((1, 2), jnp.int32),
            jnp.ones((1, 4), bool),
            jnp.zeros(1, jnp.int32),
            jnp.full(1, 2**31 - 1, jnp.int32),
            k_dense=16, k_lex=8, k_tech=8,
        )
        scores, pos = (np.asarray(x) for x in lanes["dense"])
        for p, s in zip(pos[0], scores[0]):
            if np.isfinite(s):
                assert has_emb[p], f"row {p} lacks an embedding but ranked"
