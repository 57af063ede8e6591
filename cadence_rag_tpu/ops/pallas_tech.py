"""Pallas tech-lane keys kernel: exact token-set intersection fused to
recency keys in one VMEM pass.

Why a kernel here when the dense/lex lanes stay XLA (ops/pallas_fused.py
measured XLA faster for the matmul lanes): XLA cannot fuse the tech
lane's broadcast-equality -> any-reduce -> where chain into its top-k
the way it streams a matmul epilogue, so it materializes (B, N, S)-scale
intermediates in HBM — measured 23.2 ms at batch 128 x 1M docs while a
single (B, N, S) pass already costs 16.5 ms (lane_probe, readback-
timed). This kernel keeps the whole compare in VMEM registers per block
and writes ONLY the final (B, N) f32 keys; ordering then uses the same
approx_max_k the XLA path uses, so ranking semantics are bit-identical
(reference contract: app/retrieve.py:183-242 `tech_tokens && :arr ORDER
BY call_started_at DESC, id ASC`; keys are int32 epoch-seconds bitcast
to f32, ops/techlane.py).

An earlier variant emitted top-1-per-stride-group candidates like the
dense kernel; rejected — recent matches cluster in the tail rows
(append order IS time order), so group collisions lose true top-k docs
exactly in the common case. Keys + approx_max_k has no such cliff.

Single-device TPU only (no GSPMD partitioning of pallas_call here);
the XLA path (ops/techlane.py) remains the mesh/CPU path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLOCK_N = 1024


def _kernel(q_ref, tech_t_ref, recency_ref, mask_ref, keys_ref,
            *, block_n: int, slots: int, q_width: int):
    batch = q_ref.shape[0]
    match = jnp.zeros((batch, block_n), jnp.bool_)
    # fully unrolled (s, q) compare: every operand stays 2-D (Mosaic
    # rejects >2-D reshapes) and every op is a (B, block_n) VPU pass
    for s in range(slots):
        col = tech_t_ref[s:s + 1, :]              # (1, block_n)
        for qi in range(q_width):
            qv = q_ref[:, qi:qi + 1]              # (B, 1)
            match = match | ((col == qv) & (qv != 0))
    keys_ref[:] = jnp.where(
        match & mask_ref[:], recency_ref[:], -jnp.inf
    )


def tech_keys(
    q_tech: jax.Array,       # (B, Q) int32
    tech: jax.Array,         # (N, S) int32
    started_sec: jax.Array,  # (N,) int32
    mask: jax.Array,         # (B, N) bool
    *,
    block_n: int = BLOCK_N,
) -> jax.Array:
    """(B, N) f32 recency keys; non-matches/filtered rows carry -inf."""
    n, slots = tech.shape
    batch, q_width = q_tech.shape
    assert n % block_n == 0 and block_n % LANE == 0
    grid = (n // block_n,)
    # cheap XLA pre-passes: transpose so per-slot rows are contiguous in
    # the kernel, and bitcast recency once (64 MB + 4 MB, ~0.2 ms)
    tech_t = tech.T                              # (S, N)
    recency = jax.lax.bitcast_convert_type(
        started_sec, jnp.float32
    ).reshape(1, n)

    return pl.pallas_call(
        partial(_kernel, block_n=block_n, slots=slots, q_width=q_width),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch, q_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slots, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=batch * n * slots * q_width,
            bytes_accessed=n * slots * 4 + batch * n * 5,
            transcendentals=0,
        ),
    )(q_tech, tech_t, recency, mask)


def tech_topk_pallas(
    doc_tokens: jax.Array,
    started_sec: jax.Array,
    q_tokens: jax.Array,
    mask: jax.Array,
    k: int,
    recall_target: float = 0.95,
    *,
    block_n: int = BLOCK_N,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ops/techlane.tech_topk on single-device TPU."""
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            keys = tech_keys(q_tokens, doc_tokens, started_sec, mask,
                             block_n=block_n)
    else:
        keys = tech_keys(q_tokens, doc_tokens, started_sec, mask,
                         block_n=block_n)
    from .topk import approx_topk_sorted

    return approx_topk_sorted(keys, k, recall_target=recall_target)


def usable(n: int, backend: str) -> bool:
    """Kernel applicability: single-device TPU, block-aligned corpus
    (capacities are pow2 or pow2/8 multiples, so >=8k rows align)."""
    return backend == "tpu" and n % BLOCK_N == 0
