"""The fused multi-lane retrieval program.

Where the reference issues five sequential SQL round-trips per /retrieve
(bm25 chunks/artifacts, tech chunks/artifacts, dense chunks/artifacts;
reference: app/retrieve.py:445-487), this is ONE jitted XLA program per
corpus: the dense and lexical matmuls and the tech-token intersection share
a single pass over the HBM-resident document arrays, filters are fused as
masks, and each lane ends in an on-device top-k. XLA fuses the elementwise
mask/threshold work into the matmul epilogues.

Compiled once per (capacity, batch, k, mode) signature; capacities grow by
doubling (core/index.py) so recompiles are logarithmic in corpus growth.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .lexical import lexical_topk
from .masks import filter_mask
from .techlane import tech_topk
from .topk import masked_topk_approx, masked_topk_exact, dense_scores

LaneResult = Tuple[jax.Array, jax.Array]


@partial(
    jax.jit,
    static_argnames=(
        "k_dense", "k_lex", "k_tech", "dense_mode", "recall_target",
        "dense_enabled",
    ),
)
def multi_lane_retrieve(
    emb: jax.Array,          # (N, dim) storage dtype
    lex_w: jax.Array,        # (N, D) int8
    tech: jax.Array,         # (N, S) int32
    call_idx: jax.Array,     # (N,) int32
    started_sec: jax.Array,  # (N,) int32
    q_emb: jax.Array,        # (B, dim) f32
    q_lex: jax.Array,        # (B, D) f32
    q_tech: jax.Array,       # (B, Q) int32
    allowed_calls: jax.Array,  # (B, C) bool
    date_min: jax.Array,     # (B,) int32
    date_max: jax.Array,     # (B,) int32
    *,
    k_dense: int,
    k_lex: int,
    k_tech: int,
    dense_mode: str = "exact",
    recall_target: float = 0.95,
    dense_enabled: bool = True,
) -> Dict[str, LaneResult]:
    mask = filter_mask(call_idx, started_sec, allowed_calls, date_min, date_max)

    out: Dict[str, LaneResult] = {}
    out["lex"] = lexical_topk(q_lex, lex_w, mask, k_lex)
    out["tech"] = tech_topk(tech, started_sec, q_tech, mask, k_tech)

    if dense_enabled:
        scores = dense_scores(q_emb, emb)
        if dense_mode == "exact":
            out["dense"] = masked_topk_exact(scores, mask, k_dense)
        else:
            out["dense"] = masked_topk_approx(
                scores, mask, k_dense, recall_target
            )
    return out
