"""Deterministic hash embedder.

No reference counterpart (their tests simply disable embeddings; noted as a
gap in the reference's own plan — SURVEY.md §4). This provider makes the
dense lane testable end-to-end offline: each lexical feature hashes to a
deterministic gaussian direction, a text embeds to the L2-normalized sum of
its feature directions — so texts sharing vocabulary are cosine-similar,
which is all the dense-lane quality gates need. Obeys the reference vector
contract: unit-norm, settings.embeddings_dim wide.

Directions live in one contiguous bank array (hash -> row), so the warm
path per text is dict lookups + one fancy-index + one GEMV instead of a
per-feature dict-get/np.stack (which cost ~20 ms per 64-query batch on the
1-core serving host, profiled); feature extraction uses the native
featurizer when built.
"""

from __future__ import annotations

import threading
from typing import Dict, Sequence, Tuple

import numpy as np

from ..config import settings
from ..ops.hashing import lexical_features
from .provider import EmbeddingResult

_MODEL_ID = "hash-embedder-v1"
_BANK_MAX_ROWS = 200_000


def _direction(h: int, dim: int) -> np.ndarray:
    """The canonical (original) direction function: one gaussian row seeded
    by the masked 64-bit feature hash."""
    rng = np.random.default_rng(h & 0x7FFFFFFFFFFFFFFF)
    return rng.standard_normal(dim).astype(np.float32)


class _DirectionBank:
    def __init__(self, dim: int):
        self.dim = dim
        self.rows = np.zeros((256, dim), dtype=np.float32)
        self.row_of: Dict[int, int] = {}
        self.n = 0
        # sorted snapshot for the warm path: per-hash dict .get loops cost
        # ~0.09 ms/query at F~100 features (profiled on the 1-core serving
        # host); np.searchsorted makes the all-hit lookup one C pass
        self._skeys = np.zeros(0, dtype=np.uint64)
        self._srows = np.zeros(0, dtype=np.int64)
        self.lock = threading.Lock()

    def _lookup(self, hashes: np.ndarray) -> np.ndarray:
        """row index per hash, -1 for misses (vectorized)."""
        if self._skeys.size == 0:
            return np.full(hashes.shape, -1, dtype=np.int64)
        pos = np.searchsorted(self._skeys, hashes)
        pos_c = np.minimum(pos, self._skeys.size - 1)
        return np.where(self._skeys[pos_c] == hashes, self._srows[pos_c], -1)

    def _rebuild_sorted(self) -> None:
        keys = np.fromiter(self.row_of.keys(), dtype=np.uint64,
                           count=len(self.row_of))
        vals = np.fromiter(self.row_of.values(), dtype=np.int64,
                           count=len(self.row_of))
        order = np.argsort(keys)
        self._skeys = keys[order]
        self._srows = vals[order]

    def directions(self, hashes: np.ndarray) -> np.ndarray:
        """(F, dim) direction matrix for the given feature hashes."""
        with self.lock:
            rows = self._lookup(hashes)
            if rows.size == 0 or rows.min() >= 0:  # warm path: all cached
                return self.rows[rows]
            out = np.empty((len(hashes), self.dim), dtype=np.float32)
            hit = rows >= 0
            out[hit] = self.rows[rows[hit]]
            inserted = False
            for i in np.flatnonzero(~hit):
                h = int(hashes[i])
                row = self.row_of.get(h)  # duplicate miss within this call
                if row is not None:
                    out[i] = self.rows[row]
                    continue
                vec = _direction(h, self.dim)
                out[i] = vec
                if self.n < _BANK_MAX_ROWS:
                    if self.n >= self.rows.shape[0]:
                        grown = np.zeros(
                            (self.rows.shape[0] * 2, self.dim),
                            dtype=np.float32,
                        )
                        grown[: self.n] = self.rows[: self.n]
                        self.rows = grown
                    self.rows[self.n] = vec
                    self.row_of[h] = self.n
                    self.n += 1
                    inserted = True
            if inserted:
                self._rebuild_sorted()
            return out


_banks: Dict[int, _DirectionBank] = {}
_banks_lock = threading.Lock()


def _bank(dim: int) -> _DirectionBank:
    with _banks_lock:
        bank = _banks.get(dim)
        if bank is None:
            bank = _DirectionBank(dim)
            _banks[dim] = bank
        return bank


def _features(text: str) -> Tuple[np.ndarray, np.ndarray]:
    try:
        from ..native import lexhash

        if lexhash.available():
            return lexhash.raw_features(text)
    except Exception:
        pass
    feats = lexical_features(text)
    hashes = np.fromiter(feats.keys(), dtype=np.uint64, count=len(feats))
    tfs = np.fromiter(feats.values(), dtype=np.float32, count=len(feats))
    return hashes, tfs


def _features_batch(texts: Sequence[str]):
    """One native call for the whole batch (native/lexhash
    raw_features_batch); per-text fallback otherwise."""
    try:
        from ..native import lexhash

        if lexhash.available():
            return lexhash.raw_features_batch(texts)
    except Exception:
        pass
    return [_features(text) for text in texts]


def embed_one(text: str, dim: int) -> np.ndarray:
    hashes, tfs = _features(text)
    if hashes.size == 0:
        out = np.zeros(dim, dtype=np.float32)
        out[0] = 1.0
        return out
    dirs = _bank(dim).directions(hashes)
    acc = np.log1p(tfs) @ dirs
    norm = float(np.linalg.norm(acc))
    return acc / norm if norm > 0 else acc


class HashEmbeddingProvider:
    model_id = _MODEL_ID

    def embed(self, texts: Sequence[str]) -> EmbeddingResult:
        """Batched: one bank lookup (lock + searchsorted) for ALL texts'
        features, then ONE weighted segment-sum (np.add.reduceat) across
        the whole batch — the per-text GEMV loop cost ~12 ms per
        128-query batch in small-call overhead (profiled). Vectors match
        embed_one's up to f32 summation order (same features, same
        directions; no caller depends on bitwise equality between the
        batched and single-text paths)."""
        dim = int(settings.embeddings_dim)
        out = np.zeros((len(texts), dim), dtype=np.float32)
        if not texts:
            return EmbeddingResult(vectors=out, model=self.model_id)
        feats = _features_batch(texts)
        all_hashes = np.concatenate([h for h, _ in feats])
        if all_hashes.size == 0:
            out[:, 0] = 1.0
            return EmbeddingResult(vectors=out, model=self.model_id)
        # Dedup BEFORE touching the bank: queries in a batch share zipfian
        # vocabulary (~2x dedup), and more importantly the per-text GEMVs
        # then re-gather from a compact cache-warm (U, dim) block instead
        # of the multi-hundred-MB bank — measured 143 -> 11 ms per
        # 128-query batch (dim 1024, 100k-row bank, 1-core host). Bitwise
        # identical to the undeduped path: same rows, same per-text
        # summation order.
        uniq, inv = np.unique(all_hashes, return_inverse=True)
        dirs = _bank(dim).directions(uniq)
        off = 0
        for i, (hashes, tfs) in enumerate(feats):
            size = int(hashes.size)
            if size == 0:
                out[i, 0] = 1.0
                continue
            out[i] = np.log1p(tfs) @ dirs[inv[off:off + size]]
            off += size
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return EmbeddingResult(vectors=out, model=self.model_id)
