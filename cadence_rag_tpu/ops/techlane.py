"""Exact tech-token lane: hash-set intersection + recency ordering.

Replaces the GIN array-overlap query `tech_tokens && :arr ORDER BY
call_started_at DESC, id ASC` (reference: app/retrieve.py:183-242).

Each document carries S int32 token-hash slots (0 = empty). A query carries
Q hashed tokens. Match = any slot equals any query hash. Ordering is by
recency: ``lax.top_k`` over int32 call-start seconds; top_k's
lowest-index-wins tie-break reproduces the reference's secondary
``id ASC`` order because documents are appended in id order.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy: a module-level jnp value would initialize the XLA backend
# at import, breaking jax.distributed.initialize on multi-host startup
INT32_MIN = np.int32(-2147483648)


def tech_match(doc_tokens: jax.Array, q_tokens: jax.Array) -> jax.Array:
    """(N, S) slot-addressed doc hashes vs (B, S*C) query structure ->
    (B, N) bool any-intersection.

    Docs store token h at slot h%S or (h>>8)%S (2-choice,
    ops/hashing.tech_token_hashes); the query structure holds, per slot,
    up to C hashes that could live there (ops/hashing.
    tech_query_structure). The compare is therefore C slot-ALIGNED
    (B, N, S) passes instead of the old (B, N, Q, S) broadcast — the
    fused program's dominant cost, measured 16.7 -> 7.1 ms at C=2,
    batch 128 x 1M rows (lane_probe) — and the query token budget rises
    from a silent cap of 8 to ~S*C with per-slot overflow surfaced in
    debug payloads."""
    n_cols = q_tokens.shape[1]
    slots = doc_tokens.shape[1]
    capacity = n_cols // slots
    assert capacity * slots == n_cols, (n_cols, slots)
    match = None
    for c in range(capacity):
        q = q_tokens[:, c * slots:(c + 1) * slots]      # (B, S)
        eq = (q[:, None, :] == doc_tokens[None, :, :]) & (q[:, None, :] != 0)
        hit = jnp.any(eq, axis=2)
        match = hit if match is None else (match | hit)
    return match


def tech_topk(
    doc_tokens: jax.Array,
    started_sec: jax.Array,
    q_tokens: jax.Array,
    mask: jax.Array,
    k: int,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (f32 recency keys, positions); non-matches carry -inf.

    Recency keys are the int32 epoch-seconds BITCAST to f32: IEEE floats
    with the same sign compare exactly like their integer bit patterns, so
    ordering is preserved bit-exactly for non-negative seconds (valid until
    epoch 2139095041 ~ year 2037) while top_k takes XLA:TPU's fast f32
    TopK path instead of a full int sort."""
    match = tech_match(doc_tokens, q_tokens)
    recency = jax.lax.bitcast_convert_type(started_sec, jnp.float32)
    keys = jnp.where(match & mask, recency[None, :], -jnp.inf)
    # approx_max_k: exact TopK costs ~11 ms per lane at 1M docs on-chip.
    # Recall 0.95 only matters when more than k documents carry the
    # queried identifier — exact-token matches are sparse by construction,
    # so the realized recall is ~1.0.
    from .topk import approx_topk_sorted

    return approx_topk_sorted(keys, k, recall_target=recall_target)
