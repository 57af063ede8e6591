"""Per-lane device-time probe at production shapes.

Measures, on the live backend (real TPU via the tunnel, or CPU), the
amortized per-dispatch time of each lane of the fused program plus
candidate redesigns — the measurement harness behind VERDICT r2 item 3
(drive the device program toward its bandwidth roof).

Usage:
  python -m cadence_rag_tpu.evals.lane_probe [--n 1000000] [--batch 128]
      [--iters 20] [--probe tech|lex|all]

Methodology (NOTES_DEV.md experiment gotchas): jits defined ONCE at
module level, corpus arrays generated ON DEVICE and passed as arguments
(never closed over), pipelined timing (enqueue iters, block once).
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

S = 16  # tech_hash_slots


# ---------------------------------------------------------------- corpus ----

@partial(jax.jit, static_argnames=("n", "dim"))
def _gen_emb(key, *, n, dim):
    v = jax.random.normal(key, (n, dim), dtype=jnp.float32)
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("n", "lex_dim"))
def _gen_lex(key, *, n, lex_dim):
    return jax.random.randint(key, (n, lex_dim), -8, 8, dtype=jnp.int8)


@partial(jax.jit, static_argnames=("n",))
def _gen_tech(key, *, n):
    return jax.random.randint(key, (n, S), 1, 1 << 30, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("n",))
def _gen_started(key, *, n):
    return jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)


# ----------------------------------------------------------------- lanes ----

@jax.jit
def lane_dense(emb, q):
    scores = jax.lax.dot_general(
        q, emb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.approx_max_k(scores, 50)


@jax.jit
def lane_lex(lex, q):
    scores = jax.lax.dot_general(
        q, lex.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.approx_max_k(scores, 50)


@jax.jit
def lane_dense_bf16plane(emb, q):
    """Dense lane with the (B, N) score plane narrowed to bf16 between
    the matmul epilogue and approx_max_k — halves plane write+read HBM
    traffic; quality impact measured host-side first (NOTES_DEV)."""
    scores = jax.lax.dot_general(
        q, emb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return jax.lax.approx_max_k(scores.astype(jnp.float32), 50)


@jax.jit
def lane_dense_bf16plane_native(emb, q):
    """Same, but approx_max_k runs directly on the bf16 plane (no widen
    back) — tests whether PartialReduce accepts bf16 operands and what
    it costs."""
    scores = jax.lax.dot_general(
        q, emb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return jax.lax.approx_max_k(scores, 50)


@jax.jit
def lane_lex_bf16plane(lex, q):
    scores = jax.lax.dot_general(
        q, lex.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return jax.lax.approx_max_k(scores.astype(jnp.float32), 50)


@jax.jit
def lane_tech_current(tech, started, q_tech):
    """The shipping (B,N,Q,S) broadcast compare."""
    eq = q_tech[:, None, :, None] == tech[None, :, None, :]
    nonzero = q_tech[:, None, :, None] != 0
    match = jnp.any(eq & nonzero, axis=(2, 3))
    recency = jax.lax.bitcast_convert_type(started, jnp.float32)
    keys = jnp.where(match, recency[None, :], -jnp.inf)
    return jax.lax.approx_max_k(keys, 50)


@jax.jit
def lane_tech_slotted(tech, started, q_by_slot):
    """Slot-aligned compare: docs store token hash at slot h%S (linear
    probe window P on insert); the query pre-buckets its hashes into the
    slots they could occupy -> (B, S, C) vs (N, S): ops B*N*S*C instead
    of B*N*Q*S, and Q becomes unbounded."""
    # (B, 1, S, C) == (1, N, S, 1) -> any over (S, C)
    eq = q_by_slot[:, None, :, :] == tech[None, :, :, None]
    nonzero = q_by_slot[:, None, :, :] != 0
    match = jnp.any(eq & nonzero, axis=(2, 3))
    recency = jax.lax.bitcast_convert_type(started, jnp.float32)
    keys = jnp.where(match, recency[None, :], -jnp.inf)
    return jax.lax.approx_max_k(keys, 50)


@jax.jit
def lane_tech_slotted_unrolled(tech, started, q_by_slot):
    """Slot-aligned compare with the per-slot capacity C UNROLLED into
    separate (B,N,S) passes — keeps S as the minor dim so the VPU
    vectorizes each pass like the current lane does."""
    match = None
    for c in range(q_by_slot.shape[2]):
        q = q_by_slot[:, :, c]                      # (B, S)
        eq = (q[:, None, :] == tech[None, :, :]) & (q[:, None, :] != 0)
        hit = jnp.any(eq, axis=2)
        match = hit if match is None else (match | hit)
    recency = jax.lax.bitcast_convert_type(started, jnp.float32)
    keys = jnp.where(match, recency[None, :], -jnp.inf)
    return jax.lax.approx_max_k(keys, 50)


@jax.jit
def lane_tech_onepass(tech, started, q_one):
    """Unit cost of a single (B,N,S) compare pass (C=1)."""
    eq = (q_one[:, None, :] == tech[None, :, :]) & (q_one[:, None, :] != 0)
    match = jnp.any(eq, axis=2)
    recency = jax.lax.bitcast_convert_type(started, jnp.float32)
    keys = jnp.where(match, recency[None, :], -jnp.inf)
    return jax.lax.approx_max_k(keys, 50)


@jax.jit
def lane_tech_percol(tech, started, q_one):
    """Per-slot-COLUMN compare over the existing (N, S) storage: S
    passes of (B, N)-shaped ops keep N in the 128-lane dim throughout.
    The (B,N,S) one-pass form puts S=16 in lanes (padded 8x to the
    128-lane tile); here every intermediate is (B, N). Column reads are
    strided, but all S slices come from one array — XLA can read each
    tile once and feed all S compares."""
    match = None
    for s in range(tech.shape[1]):
        hit = ((q_one[:, s, None] == tech[None, :, s])
               & (q_one[:, s, None] != 0))
        match = hit if match is None else (match | hit)
    recency = jax.lax.bitcast_convert_type(started, jnp.float32)
    keys = jnp.where(match, recency[None, :], -jnp.inf)
    return jax.lax.approx_max_k(keys, 50)


@jax.jit
def lane_tech_percol_t(tech_t, started, q_one):
    """Per-slot-column compare over TRANSPOSED (S, N) storage —
    contiguous (N,) reads per slot; measures whether the strided column
    access of the (N, S) layout costs anything once S is unrolled."""
    match = None
    for s in range(tech_t.shape[0]):
        hit = ((q_one[:, s, None] == tech_t[s][None, :])
               & (q_one[:, s, None] != 0))
        match = hit if match is None else (match | hit)
    recency = jax.lax.bitcast_convert_type(started, jnp.float32)
    keys = jnp.where(match, recency[None, :], -jnp.inf)
    return jax.lax.approx_max_k(keys, 50)


@jax.jit
def lane_tech_summary(tech_bits, tech, started, q_bits, q_tech):
    """Two-level: 32-bit per-doc summary bitmap prefilter (cheap), exact
    compare still full-width but masked — measures whether XLA can skip
    work (it can't: dense exec) — expected ~same as current + bitmap."""
    hit = (tech_bits[None, :] & q_bits[:, None]) != 0
    eq = q_tech[:, None, :, None] == tech[None, :, None, :]
    nonzero = q_tech[:, None, :, None] != 0
    match = jnp.any(eq & nonzero, axis=(2, 3)) & hit
    recency = jax.lax.bitcast_convert_type(started, jnp.float32)
    keys = jnp.where(match, recency[None, :], -jnp.inf)
    return jax.lax.approx_max_k(keys, 50)


def _timed(fn, *args, iters=20, label=""):
    """Amortized device time per dispatch, completion forced by a
    device_get READBACK of the final output. Through the axon tunnel
    neither block_until_ready nor enqueue back-pressure reliably waits
    for small-output programs (measured 0.05 ms 'latency' for a 2 GB
    matmul); the device executes serially, so reading back call N's
    output bounds calls 1..N."""
    jax.device_get(fn(*args))  # compile + execute
    jax.device_get(fn(*args))  # warm
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    out = jax.device_get(fn(*args))
    del out
    total = time.perf_counter() - t0
    ms = total / iters * 1e3
    print(f"{label:<28} {ms:8.2f} ms/dispatch "
          f"(readback-amortized x{iters})")
    return ms


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--lex-dim", type=int, default=4096)
    parser.add_argument("--dim", type=int, default=1024)
    parser.add_argument("--probe", default="all",
                        choices=["tech", "lex", "dense", "plane", "all"])
    parser.add_argument("--q", type=int, default=8,
                        help="query tech slots for the current lane")
    parser.add_argument("--c", type=int, default=3,
                        help="per-slot query capacity for slotted lane")
    args = parser.parse_args()

    n, b = args.n, args.batch
    print(f"backend={jax.default_backend()} device={jax.devices()[0]} "
          f"n={n} batch={b}")
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    rng = np.random.default_rng(0)

    if args.probe in ("dense", "all"):
        emb = _gen_emb(keys[0], n=n, dim=args.dim)
        jax.block_until_ready(emb)
        q = jnp.asarray(rng.standard_normal((b, args.dim)), jnp.float32)
        _timed(lane_dense, emb, q, iters=args.iters,
               label=f"dense bf16 ({args.dim})")
        del emb

    if args.probe in ("lex", "all"):
        lex = _gen_lex(keys[1], n=n, lex_dim=args.lex_dim)
        jax.block_until_ready(lex)
        ql = jnp.asarray(
            rng.standard_normal((b, args.lex_dim)) * 0.05, jnp.float32)
        _timed(lane_lex, lex, ql, iters=args.iters,
               label=f"lex int8->bf16 ({args.lex_dim})")
        del lex

    if args.probe == "plane":
        # f32 vs bf16 score-plane cost, dense + lex, at production shapes
        emb = _gen_emb(keys[0], n=n, dim=args.dim)
        jax.block_until_ready(emb)
        q = jnp.asarray(rng.standard_normal((b, args.dim)), jnp.float32)
        _timed(lane_dense, emb, q, iters=args.iters,
               label=f"dense f32 plane ({args.dim})")
        _timed(lane_dense_bf16plane, emb, q, iters=args.iters,
               label="dense bf16 plane (widen)")
        _timed(lane_dense_bf16plane_native, emb, q, iters=args.iters,
               label="dense bf16 plane (native)")
        del emb
        lex = _gen_lex(keys[1], n=n, lex_dim=args.lex_dim)
        jax.block_until_ready(lex)
        ql = jnp.asarray(
            rng.standard_normal((b, args.lex_dim)) * 0.05, jnp.float32)
        _timed(lane_lex, lex, ql, iters=args.iters,
               label=f"lex f32 plane ({args.lex_dim})")
        _timed(lane_lex_bf16plane, lex, ql, iters=args.iters,
               label="lex bf16 plane (widen)")
        del lex

    if args.probe in ("tech", "all"):
        tech = _gen_tech(keys[2], n=n)
        started = _gen_started(keys[3], n=n)
        jax.block_until_ready((tech, started))
        q_tech = jnp.asarray(
            rng.integers(1, 1 << 30, (b, args.q)), jnp.int32)
        _timed(lane_tech_current, tech, started, q_tech,
               iters=args.iters, label=f"tech current (Q={args.q},S={S})")
        q_slot = jnp.asarray(
            rng.integers(1, 1 << 30, (b, S, args.c)), jnp.int32)
        _timed(lane_tech_slotted, tech, started, q_slot,
               iters=args.iters, label=f"tech slotted (S={S},C={args.c})")
        for c in (2, 3):
            q_u = jnp.asarray(
                rng.integers(1, 1 << 30, (b, S, c)), jnp.int32)
            _timed(lane_tech_slotted_unrolled, tech, started, q_u,
                   iters=args.iters,
                   label=f"tech slotted unrolled C={c}")
        q_one = jnp.asarray(rng.integers(1, 1 << 30, (b, S)), jnp.int32)
        _timed(lane_tech_onepass, tech, started, q_one,
               iters=args.iters, label="tech one-pass (B,N,S)")
        _timed(lane_tech_percol, tech, started, q_one,
               iters=args.iters, label="tech per-col (S x (B,N))")
        tech_t = jax.jit(lambda t: t.T.copy())(tech)  # on-device transpose
        jax.block_until_ready(tech_t)
        _timed(lane_tech_percol_t, tech_t, started, q_one,
               iters=args.iters, label="tech per-col transposed")
        del tech_t
        if jax.default_backend() == "tpu":
            from cadence_rag_tpu.ops.pallas_tech import tech_topk_pallas

            full_mask = jnp.ones((b, n), dtype=jnp.bool_)

            @jax.jit
            def fn(tech_, started_, q_, mask_):
                return tech_topk_pallas(tech_, started_, q_, mask_, 50)

            _timed(fn, tech, started, q_tech, full_mask,
                   iters=args.iters,
                   label=f"tech PALLAS kernel (Q={args.q})")
            q16 = jnp.asarray(
                rng.integers(1, 1 << 30, (b, 16)), jnp.int32)
            _timed(fn, tech, started, q16, full_mask,
                   iters=args.iters, label="tech PALLAS kernel (Q=16)")
        bits = jnp.asarray(rng.integers(0, 1 << 31, n), jnp.int32)
        qbits = jnp.asarray(rng.integers(0, 1 << 31, b), jnp.int32)
        _timed(lane_tech_summary, bits, tech, started, qbits, q_tech,
               iters=args.iters, label="tech summary+full")


if __name__ == "__main__":
    main()
