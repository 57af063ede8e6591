"""Fused dense+lexical Pallas kernel vs the XLA lane implementations
(interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cadence_rag_tpu.ops import lexical, topk
from cadence_rag_tpu.ops.pallas_fused import pallas_fused_topk


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestPallasFused:
    def test_both_lanes_match_xla_candidates(self):
        rng = np.random.default_rng(0)
        n, dim, dlex, batch = 1024, 64, 256, 2
        emb = _unit_rows(rng, n, dim).astype(np.float32)
        lex = rng.integers(-4, 5, size=(n, dlex)).astype(np.int8)
        q_emb = emb[[5, 700]].copy()
        q_lex = (rng.standard_normal((batch, dlex)) * 0.2).astype(np.float32)
        mask = np.ones((batch, n), dtype=bool)

        out = pallas_fused_topk(
            jnp.asarray(q_emb), jnp.asarray(q_lex),
            jnp.asarray(emb, dtype=jnp.bfloat16), jnp.asarray(lex),
            jnp.asarray(mask),
            k_dense=5, k_lex=5, block_n=256, interpret=True,
        )
        # dense self-match
        d_idx = np.asarray(out["dense"][1])
        assert int(d_idx[0, 0]) == 5 and int(d_idx[1, 0]) == 700

        # lexical winners agree with the XLA lane (bf16 rounding tolerated:
        # require top-1 match and >=3/5 overlap)
        x_scores, x_idx = lexical.lexical_topk(
            jnp.asarray(q_lex), jnp.asarray(lex),
            jnp.asarray(mask), 5,
        )
        l_idx = np.asarray(out["lex"][1])
        x_idx = np.asarray(x_idx)
        for b in range(batch):
            assert l_idx[b, 0] == x_idx[b, 0]
            assert len(set(l_idx[b]) & set(x_idx[b])) >= 3

    def test_mask_respected_both_lanes(self):
        rng = np.random.default_rng(1)
        n, dim, dlex = 512, 32, 128
        emb = _unit_rows(rng, n, dim)
        lex = rng.integers(-4, 5, size=(n, dlex)).astype(np.int8)
        q_emb = emb[[9]].copy()
        q_lex = (rng.standard_normal((1, dlex)) * 0.2).astype(np.float32)
        mask = np.ones((1, n), dtype=bool)
        mask[0, 9] = False
        out = pallas_fused_topk(
            jnp.asarray(q_emb), jnp.asarray(q_lex),
            jnp.asarray(emb, dtype=jnp.bfloat16), jnp.asarray(lex),
            jnp.asarray(mask),
            k_dense=4, k_lex=4, block_n=128, interpret=True,
        )
        assert 9 not in set(map(int, np.asarray(out["dense"][1])[0]))
