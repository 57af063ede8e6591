"""Document featurization: text -> device-index row features.

Bridges host text to the device representation (lexical signature, tech
hash slots). Dispatches to the native C++ featurizer (native/lexhash.cpp)
when built, falling back to the pure-Python reference implementation in
ops/hashing.py — both produce bit-identical features (tested).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..config import settings
from ..ops import hashing


def _native():
    try:
        from ..native import lexhash  # noqa: PLC0415

        return lexhash if lexhash.available() else None
    except Exception:
        return None


def lexical_signature(
    text: str, avgdl: float
) -> Tuple[np.ndarray, np.ndarray, int]:
    """-> (int8 signature[lexical_dim], touched buckets, doc length)."""
    dim = int(settings.lexical_dim)
    native = _native()
    if native is not None:
        return native.doc_signature(text, dim, avgdl)
    return hashing.doc_signature(text, dim, avgdl)


def query_lexical_vector(
    text: str, doc_freq: np.ndarray, n_docs: int
) -> np.ndarray:
    return hashing.query_vector(text, int(settings.lexical_dim), doc_freq, n_docs)


def query_lexical_features(text: str):
    """Hash once; reuse across corpora via query_lexical_vector_from.
    Native path: ~15 ms/64-query batch of pure-Python FNV loops (profiled
    on the 1-core serving host) drops to microseconds in C++."""
    dim = int(settings.lexical_dim)
    native = _native()
    if native is not None:
        return native.query_features(text, dim)
    return hashing.query_feature_arrays(text, dim)


def query_lexical_features_batch(texts):
    """Per-text feature triples for a request batch in ONE native call
    (native/lexhash.query_features_batch); falls back to per-text
    hashing when the native featurizer is unavailable."""
    dim = int(settings.lexical_dim)
    native = _native()
    if native is not None:
        return native.query_features_batch(texts, dim)
    return [hashing.query_feature_arrays(text, dim) for text in texts]


def query_lexical_vector_from(
    feats, doc_freq: np.ndarray, n_docs: int
) -> np.ndarray:
    buckets, signs, tfs = feats
    return hashing.query_vector_from_features(
        buckets, signs, tfs, int(settings.lexical_dim), doc_freq, n_docs
    )


def tech_slots(tokens: Sequence[str]) -> np.ndarray:
    return hashing.tech_token_hashes(tokens, int(settings.tech_hash_slots))


def query_tech_hashes(
    tokens: Sequence[str], max_q: Optional[int] = None
) -> np.ndarray:
    """Query-side token hashes, fixed width. The tech-lane compare costs
    B*N*Q*S ops — at Q=32 it dominated the whole fused program (67 of
    74 ms at 1M docs, measured); the default Q=8 covers every realistic
    query (how many exact identifiers does one question carry?) at a
    quarter of the cost."""
    width = int(settings.tech_query_slots) if max_q is None else max_q
    return hashing.tech_token_hashes(tokens, width)
