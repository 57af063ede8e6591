"""Filter scoping as boolean masks fused into the device scan.

The reference builds SQL WHERE clauses per lane (reference:
app/retrieve.py:93-120); every supported filter (date_from/date_to,
call_ids, external_id->call_ids, call_tags) is *call-level*, so on device a
filter is: a per-query bitmap over the call registry (resolved on host,
engine/filters.py) gathered through each document's call index, plus a date
range over call-start seconds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .techlane import INT32_MIN


def filter_mask(
    call_idx: jax.Array,      # (N,) int32 index into call registry
    started_sec: jax.Array,   # (N,) int32; INT32_MIN marks invalid rows
    allowed_calls: jax.Array, # (B, C) bool per-query call bitmap
    date_min: jax.Array,      # (B,) int32 inclusive; INT32_MIN+1 if unbounded
    date_max: jax.Array,      # (B,) int32 inclusive; INT32_MAX if unbounded
) -> jax.Array:
    """-> (B, N) bool."""
    valid = started_sec != INT32_MIN
    in_call = jnp.take(allowed_calls, call_idx, axis=1)  # (B, N)
    after = started_sec[None, :] >= date_min[:, None]
    before = started_sec[None, :] <= date_max[:, None]
    return in_call & after & before & valid[None, :]
