"""Native featurizer parity: lexhash.cpp must match ops/hashing.py
bit-for-bit (signature bytes, touched buckets, doc length)."""

import numpy as np
import pytest

from cadence_rag_tpu.native import lexhash
from cadence_rag_tpu.ops import hashing

CASES = [
    "the ECONNRESET storm started after the object store upgrade",
    "rolling back to v2.3.1 stopped the resets immediately",
    "short",
    "",
    "   whitespace   collapse\t\ttest\n\nlines   ",
    "unicode naïve café 模型 text mixed with ascii_words_123",
    "repeated repeated repeated repeated tokens tokens tokens",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "punctuation!!! and, some; (symbols) [here] {ok}",
    "x" * 5000,
]


@pytest.mark.skipif(not lexhash.available(), reason="no native toolchain")
class TestNativeParity:
    @pytest.mark.parametrize("dim", [512, 1024, 4096])
    @pytest.mark.parametrize("avgdl", [1.0, 40.0, 1500.0])
    def test_signature_bit_parity(self, dim, avgdl):
        for text in CASES:
            py_sig, py_touched, py_dl = hashing.doc_signature(text, dim, avgdl)
            c_sig, c_touched, c_dl = lexhash.doc_signature(text, dim, avgdl)
            assert c_dl == py_dl, f"dl mismatch for {text[:40]!r}"
            np.testing.assert_array_equal(
                c_sig, py_sig, err_msg=f"sig mismatch for {text[:40]!r}"
            )
            np.testing.assert_array_equal(c_touched, py_touched)

    @pytest.mark.parametrize("dim", [512, 4096])
    def test_query_features_bit_parity(self, dim):
        for text in CASES:
            c_b, c_s, c_t = lexhash.query_features(text, dim)
            p_b, p_s, p_t = hashing.query_feature_arrays(text, dim)
            np.testing.assert_array_equal(
                c_b, p_b, err_msg=f"buckets mismatch for {text[:40]!r}"
            )
            np.testing.assert_array_equal(c_s, p_s)
            np.testing.assert_array_equal(c_t, p_t)
            assert c_b.dtype == p_b.dtype
            assert c_s.dtype == p_s.dtype

    def test_native_is_faster(self):
        import time

        text = " ".join(
            f"token{i} ECONNRESET v1.{i}.3 the quick brown fox" for i in range(60)
        )
        lexhash.doc_signature(text, 4096, 500.0)  # warm/build
        t0 = time.perf_counter()
        for _ in range(50):
            lexhash.doc_signature(text, 4096, 500.0)
        native_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(50):
            hashing.doc_signature(text, 4096, 500.0)
        python_t = time.perf_counter() - t0
        assert native_t < python_t, (native_t, python_t)


class TestBatchFeaturize:
    """Batch entry points (one ctypes crossing per request batch) must be
    bit-identical to the per-text calls."""

    def test_query_features_batch_parity(self):
        got = lexhash.query_features_batch(CASES, 4096)
        assert len(got) == len(CASES)
        for text, triple in zip(CASES, got):
            ref = lexhash.query_features(text, 4096)
            for a, b in zip(triple, ref):
                np.testing.assert_array_equal(a, b)

    def test_raw_features_batch_parity(self):
        got = lexhash.raw_features_batch(CASES)
        for text, pair in zip(CASES, got):
            ref = lexhash.raw_features(text)
            for a, b in zip(pair, ref):
                np.testing.assert_array_equal(a, b)

    def test_empty_inputs(self):
        assert lexhash.query_features_batch([], 4096) == []
        assert lexhash.raw_features_batch([]) == []
        triple = lexhash.query_features_batch([""], 4096)[0]
        assert triple[0].size == 0


@pytest.mark.skipif(not lexhash.available(), reason="no native toolchain")
class TestTechStructuresBatch:
    TOKEN_CASES = [
        [],
        ["svc-gateway.prod"],
        ["svc-gateway.prod", "API-V2.3.1", "econnreset"],
        ["dup", "DUP", "  dup  ", ""],  # normalize + dedupe + empty-drop
        [f"tok-{i}.x" for i in range(20)],  # forces capacity escalation
        ["naïve-café.模型", "plain_token"],  # unicode lowering in Python
        ["a"] * 50,
        [f"collide-{i}" for i in range(40)] + ["svc-gateway.prod"],
    ]

    @pytest.mark.parametrize("slots,cap0,max_cap", [
        (16, 1, 8), (16, 2, 8), (8, 1, 4),
    ])
    def test_parity_with_python(self, slots, cap0, max_cap):
        native_out = lexhash.tech_structures_batch(
            self.TOKEN_CASES, slots, cap0, max_cap
        )
        for tokens, (n_struct, n_drop) in zip(self.TOKEN_CASES, native_out):
            py_struct, py_drop = hashing.tech_query_structure(
                tokens, slots, cap0, max_capacity=max_cap
            )
            np.testing.assert_array_equal(n_struct, py_struct, err_msg=str(tokens)[:80])
            assert n_drop == py_drop, tokens
