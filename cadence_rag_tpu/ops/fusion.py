"""Reciprocal Rank Fusion (RRF).

Parity target: the reference fuses lanes with score = sum over lanes of
1/(k + rank), k=60, then sorts by score descending (reference:
app/retrieve.py:245-260). Two implementations:

- ``rrf_merge``: host-side, exact reference semantics including insertion
  -order stability for equal scores; operates on the <=170 per-lane
  candidates so Python cost is irrelevant.
- ``rrf_scores_device``: vectorized scatter-add over document positions for
  bulk ids_only evaluation on device.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Set, Tuple

import jax
import jax.numpy as jnp

DEFAULT_RRF_K = 60


def rrf_merge(
    lanes: Dict[str, Sequence[Any]], k: int = DEFAULT_RRF_K
) -> List[Tuple[Any, Set[str], float]]:
    """lanes: {lane_name: [doc_key, ...] ranked best-first} ->
    [(doc_key, {lanes hit}, fused_score)] sorted by score desc, first-seen
    order breaking ties (Python sort stability over insertion order)."""
    scores: Dict[Any, float] = {}
    hits: Dict[Any, Set[str]] = {}
    for lane_name, keys in lanes.items():
        for rank, key in enumerate(keys, start=1):
            scores[key] = scores.get(key, 0.0) + 1.0 / (k + rank)
            hits.setdefault(key, set()).add(lane_name)
    ordered = sorted(scores.items(), key=lambda item: item[1], reverse=True)
    return [(key, hits[key], score) for key, score in ordered]


def rrf_scores_device(
    lane_positions: jax.Array,  # (L, B, K) int32 positions; -1 = padding
    n_docs: int,
    k: int = DEFAULT_RRF_K,
) -> jax.Array:
    """-> (B, n_docs) fused RRF scores (0 where no lane hit)."""
    num_lanes, batch, topk = lane_positions.shape
    ranks = jnp.arange(1, topk + 1, dtype=jnp.float32)
    contrib = 1.0 / (k + ranks)  # (K,)
    contrib = jnp.broadcast_to(contrib, (num_lanes, batch, topk))
    valid = lane_positions >= 0
    # Scatter-add along the doc axis; padded entries scatter weight 0 into 0.
    safe_pos = jnp.where(valid, lane_positions, 0)
    out = jnp.zeros((batch, n_docs), dtype=jnp.float32)
    for lane in range(num_lanes):
        out = out.at[
            jnp.arange(batch)[:, None], safe_pos[lane]
        ].add(jnp.where(valid[lane], contrib[lane], 0.0))
    return out
