"""Deterministic hash embedder.

No reference counterpart (their tests simply disable embeddings; noted as a
gap in the reference's own plan — SURVEY.md §4). This provider makes the
dense lane testable end-to-end offline: each lexical feature hashes to a
deterministic gaussian direction, a text embeds to the L2-normalized sum of
its feature directions — so texts sharing vocabulary are cosine-similar,
which is all the dense-lane quality gates need. Obeys the reference vector
contract: unit-norm, settings.embeddings_dim wide.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from ..config import settings
from ..ops.hashing import lexical_features
from .provider import EmbeddingResult

_MODEL_ID = "hash-embedder-v1"
_cache: Dict[tuple, np.ndarray] = {}
_CACHE_MAX = 200_000


def _feature_direction(h: int, dim: int) -> np.ndarray:
    key = (h, dim)
    vec = _cache.get(key)
    if vec is None:
        rng = np.random.default_rng(h & 0x7FFFFFFFFFFFFFFF)
        vec = rng.standard_normal(dim).astype(np.float32)
        if len(_cache) < _CACHE_MAX:
            _cache[key] = vec
    return vec


def embed_one(text: str, dim: int) -> np.ndarray:
    feats = lexical_features(text)
    if not feats:
        out = np.zeros(dim, dtype=np.float32)
        out[0] = 1.0
        return out
    dirs = np.stack([_feature_direction(h, dim) for h in feats])
    weights = np.log1p(
        np.fromiter(feats.values(), dtype=np.float32, count=len(feats))
    )
    acc = weights @ dirs
    norm = float(np.linalg.norm(acc))
    return acc / norm if norm > 0 else acc


class HashEmbeddingProvider:
    model_id = _MODEL_ID

    def embed(self, texts: Sequence[str]) -> EmbeddingResult:
        dim = int(settings.embeddings_dim)
        return EmbeddingResult(
            vectors=[embed_one(t, dim).tolist() for t in texts],
            model=self.model_id,
        )
