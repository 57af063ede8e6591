"""Pallas fused dense+lexical scoring kernel: one pass, two lanes.

The round-2 "mega-kernel" direction (TODO_NEXT.md #1): where the XLA
program reads the embedding matrix for the dense lane and the signature
matrix for the lexical lane in separate fusions, this kernel streams BOTH
matrices through VMEM block by block and scores the two lanes inside one
grid step — the epilogue (mask, lane-group candidate reduction) never
materializes (B, N) scores in HBM. Same candidate scheme as
ops/pallas_topk.py (top-1 per block_n/128-doc group, exact top-k over
candidates on the host side of the kernel).

MEASURED ON-CHIP (2026-08-16, v5e, 1M docs x (1024-d bf16 + 4096-d int8),
batch 64, after the Mosaic remote-compile blocker cleared): this kernel
compiles and runs at **15.4 ms** with dense recall@50 = 1.0 vs exact —
but the equivalent XLA program (ops/topk.py + ops/lexical.py under one
jit) runs the same two lanes in **12.0 ms**. Both are within ~20% of the
6.4 GB HBM floor; XLA's scheduler overlaps the two matmuls' memory
streams better than this kernel's grid. The production path therefore
remains XLA (`use_pallas_fused` off by default); this kernel stays as a
validated reference point and the starting place if the lane set ever
changes enough to beat the compiler. block_n=1024 is the only size that
fits VMEM (2048+ fails Mosaic compile).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lexical import LEX_MATCH_THRESHOLD

LANE = 128


def _kernel(q_emb_ref, q_lex_ref, emb_ref, lex_ref, mask_ref,
            d_vals_ref, d_idx_ref, l_vals_ref, l_idx_ref, *, block_n: int):
    block_id = pl.program_id(0)
    mask = mask_ref[:]

    def group_reduce(scores):
        # Top-1 per lane over block_n/LANE stride-LANE tiles, using ONLY
        # 2-D ops (Mosaic's layout inference rejects the (B, LANE, width)
        # reshape): an unrolled running max across contiguous LANE-wide
        # tiles. Group g = {w*LANE + g : w}, an arbitrary-but-fixed
        # partition — equivalent recall to any other 1/width grouping.
        batch = scores.shape[0]
        width = block_n // LANE
        winner_val = scores[:, :LANE]
        winner_w = jnp.zeros((batch, LANE), jnp.int32)
        for w in range(1, width):
            tile = scores[:, w * LANE:(w + 1) * LANE]
            better = tile > winner_val
            winner_val = jnp.where(better, tile, winner_val)
            winner_w = jnp.where(better, w, winner_w)
        base = jax.lax.broadcasted_iota(
            jnp.int32, (batch, LANE), dimension=1
        )
        return winner_val, block_id * block_n + winner_w * LANE + base

    dense = jax.lax.dot_general(
        q_emb_ref[:], emb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_vals_ref[:], d_idx_ref[:] = group_reduce(
        jnp.where(mask, dense, -jnp.inf)
    )

    lex = jax.lax.dot_general(
        q_lex_ref[:], lex_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    lex_masked = jnp.where(mask & (lex > LEX_MATCH_THRESHOLD), lex, -jnp.inf)
    l_vals_ref[:], l_idx_ref[:] = group_reduce(lex_masked)


def fused_candidates(
    q_emb: jax.Array,   # (B, dim) f32
    q_lex: jax.Array,   # (B, D) f32 -> cast to storage dtype for MXU
    emb: jax.Array,     # (N, dim) bf16
    lex: jax.Array,     # (N, D) int8
    mask: jax.Array,    # (B, N) bool
    *,
    block_n: int = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    n, dim = emb.shape
    d_lex = lex.shape[1]
    batch = q_emb.shape[0]
    assert n % block_n == 0 and block_n % LANE == 0
    grid = (n // block_n,)
    n_candidates = (n // block_n) * LANE

    out = pl.pallas_call(
        partial(_kernel, block_n=block_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, d_lex), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d_lex), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((batch, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, n_candidates), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_candidates), jnp.int32),
            jax.ShapeDtypeStruct((batch, n_candidates), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_candidates), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * n * (dim + d_lex),
            bytes_accessed=n * (dim * emb.dtype.itemsize + d_lex),
            transcendentals=0,
        ),
    )(q_emb.astype(emb.dtype), q_lex.astype(jnp.bfloat16), emb, lex, mask)
    return tuple(out)  # type: ignore[return-value]


def pallas_fused_topk(
    q_emb: jax.Array,
    q_lex: jax.Array,
    emb: jax.Array,
    lex: jax.Array,
    mask: jax.Array,
    *,
    k_dense: int,
    k_lex: int,
    block_n: int = 1024,
    interpret: bool = False,
) -> Dict[str, Tuple[jax.Array, jax.Array]]:
    """One HBM pass over both matrices -> dense and lexical top-k."""
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            d_vals, d_idx, l_vals, l_idx = fused_candidates(
                q_emb, q_lex, emb, lex, mask, block_n=block_n
            )
    else:
        d_vals, d_idx, l_vals, l_idx = fused_candidates(
            q_emb, q_lex, emb, lex, mask, block_n=block_n
        )

    def finish(vals, idx, k):
        top_vals, top_pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
        return top_vals, jnp.take_along_axis(idx, top_pos, axis=1)

    return {
        "dense": finish(d_vals, d_idx, k_dense),
        "lex": finish(l_vals, l_idx, k_lex),
    }
