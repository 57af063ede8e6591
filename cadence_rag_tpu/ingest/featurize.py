"""Document featurization: text -> device-index row features.

Bridges host text to the device representation (lexical signature, tech
hash slots). Dispatches to the native C++ featurizer (native/lexhash.cpp)
when built, falling back to the pure-Python reference implementation in
ops/hashing.py — both produce bit-identical features (tested).
"""

from __future__ import annotations

from typing import Sequence, Tuple

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
    """Hash once; reuse across corpora via query_lexical_vector_from."""
    return hashing.query_feature_arrays(text, int(settings.lexical_dim))


def query_lexical_vector_from(
    feats, doc_freq: np.ndarray, n_docs: int
) -> np.ndarray:
    buckets, signs, tfs = feats
    return hashing.query_vector_from_features(
        buckets, signs, tfs, int(settings.lexical_dim), doc_freq, n_docs
    )


def tech_slots(tokens: Sequence[str]) -> np.ndarray:
    return hashing.tech_token_hashes(tokens, int(settings.tech_hash_slots))


def query_tech_hashes(tokens: Sequence[str], max_q: int = 32) -> np.ndarray:
    return hashing.tech_token_hashes(tokens, max_q)
