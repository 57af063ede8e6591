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

INT32_MIN = jnp.int32(-2147483648)


def tech_match(doc_tokens: jax.Array, q_tokens: jax.Array) -> jax.Array:
    """(N, S) int32 vs (B, Q) int32 -> (B, N) bool any-intersection."""
    # (B, 1, Q, 1) == (1, N, 1, S) -> any over (Q, S)
    eq = q_tokens[:, None, :, None] == doc_tokens[None, :, None, :]
    nonzero = q_tokens[:, None, :, None] != 0
    return jnp.any(eq & nonzero, axis=(2, 3))


def tech_topk(
    doc_tokens: jax.Array,
    started_sec: jax.Array,
    q_tokens: jax.Array,
    mask: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (recency_keys, positions); non-matches carry INT32_MIN keys."""
    match = tech_match(doc_tokens, q_tokens)
    keys = jnp.where(match & mask, started_sec[None, :], INT32_MIN)
    return jax.lax.top_k(keys, k)
