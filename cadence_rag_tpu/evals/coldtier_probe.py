"""On-chip cold-tier probe: beyond-HBM rows through the real backend.

The cold tier (core/coldtier.py, INDEX_MAX_DEVICE_ROWS) is oracle-tested
on CPU (tests/integration/test_cold_tier.py: capped == uncapped
bit-for-bit). This probe exercises the same dispatch/merge path on the
LIVE backend — staging host bf16/int8 blocks through the axon tunnel,
fused-program execution per block, rectangular lane merge — and reports
per-batch latency plus the H2D volume that dominates it.

Interpretation caveat (NOTES_DEV.md): through the tunneled chip, H2D
runs at ~2.7 MB/s, so cold-block shipping is ~4 orders of magnitude
slower than a local PCIe/DMA attach (~10+ GB/s). The probe therefore
reports BYTES per batch alongside time; on real hardware the cold-scan
cost is bytes / PCIe bandwidth, not this tunnel artifact.

Usage:
  python -m cadence_rag_tpu.evals.coldtier_probe \
      [--hot 65536] [--cold 8192] [--batch 32] [--block 8192] [--iters 3]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _cold_rows(start_id, n, dim, lex_dim, slots, n_calls, rng,
               sentinel_emb=None):
    from cadence_rag_tpu.core.index import DocRow

    rows = []
    for i in range(n):
        emb = rng.standard_normal(dim).astype(np.float32)
        if sentinel_emb is not None and i == 0:
            emb = sentinel_emb.copy()
        emb /= np.linalg.norm(emb)
        sig = np.zeros(lex_dim, dtype=np.int8)
        touched = rng.choice(lex_dim, size=48, replace=False)
        sig[touched] = rng.integers(-8, 9, size=48)
        touched = np.flatnonzero(sig).astype(np.int32)
        tech = np.zeros(slots, dtype=np.int32)
        tech[rng.integers(0, slots)] = int(rng.integers(1, 5000))
        rows.append(DocRow(
            doc_id=start_id + i,
            call_seq=int(rng.integers(0, n_calls)),
            started_sec=int(rng.integers(1, 1 << 30)),
            lex_sig=sig,
            lex_dl=int(np.abs(sig).sum()),
            lex_touched=touched,
            tech=tech,
            embedding=emb,
        ))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=65536)
    ap.add_argument("--cold", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--block", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--lex-dim", type=int, default=4096)
    args = ap.parse_args()

    from cadence_rag_tpu.config import settings

    settings.index_initial_capacity = 4096
    settings.index_max_device_rows = args.hot
    settings.cold_block_rows = args.block
    settings.prewarm_growth_enabled = False
    settings.lexical_dim = args.lex_dim

    import jax

    from cadence_rag_tpu.core.index import get_index, reset_index
    from cadence_rag_tpu.evals.synth import install_synthetic_corpus

    n_calls = 64
    reset_index()
    index = get_index()
    index.ensure_call_capacity(n_calls)
    print(f"backend={jax.default_backend()} hot={args.hot} "
          f"cold={args.cold} block={args.block} batch={args.batch}")
    install_synthetic_corpus(index.chunks, args.hot, n_calls, seed=0)
    install_synthetic_corpus(
        index.artifacts, max(args.hot // 10, 1024), n_calls, seed=1
    )

    dim = index.chunks.dim
    slots = index.chunks.tech_slots
    rng = np.random.default_rng(7)
    # sentinel: cold row 0 carries exactly the first query's embedding,
    # so the dense lane MUST surface it — proves cold rows compete
    q_emb = rng.standard_normal((args.batch, dim)).astype(np.float32)
    q_emb /= np.linalg.norm(q_emb, axis=1, keepdims=True)
    t0 = time.perf_counter()
    sentinel_id = args.hot + 1
    for s in range(0, args.cold, 4096):
        n = min(4096, args.cold - s)
        index.chunks.insert(_cold_rows(
            args.hot + 1 + s, n, dim, args.lex_dim, slots, n_calls, rng,
            sentinel_emb=q_emb[0] if s == 0 else None,
        ))
    print(f"cold insert: {time.perf_counter() - t0:.1f}s "
          f"(host-side; tier count={index.chunks.cold.count})")
    assert index.chunks.count == args.hot

    # engine-free packed query (the /retrieve hot path below the planner)
    feats = []
    for _ in range(args.batch):
        b = rng.choice(args.lex_dim, size=24, replace=False).astype(np.int64)
        feats.append((b, rng.choice([-1.0, 1.0], 24).astype(np.float32),
                      np.ones(24, dtype=np.float32)))
    tech_q = int(settings.tech_hash_slots) * int(settings.tech_slot_capacity)
    q_tech = rng.integers(1, 5000, (args.batch, tech_q)).astype(np.int32)
    allowed = np.ones((args.batch, n_calls), dtype=bool)
    dmin = np.full(args.batch, -2147483647, dtype=np.int32)
    dmax = np.full(args.batch, 2**31 - 1, dtype=np.int32)

    def run():
        return index.query_both_packed(
            q_emb, feats, q_tech, allowed, dmin, dmax,
            chunk_ks=(50, 50, 50), artifact_ks=(10, 10, 50),
            chunk_mode="exact", artifact_mode="exact",
            recall_target=0.95,
        )

    chunks_res, _ = run()  # compile (hot program + cold block program)
    ids, scores, counts = chunks_res["dense"]
    assert int(ids[0, 0]) == sentinel_id, (
        f"sentinel cold row not top-1: got {ids[0, :5]}"
    )
    print(f"sentinel OK: cold doc {sentinel_id} is dense top-1 "
          f"(score {float(scores[0, 0]):.4f})")

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    tier = index.chunks.cold
    # bytes shipped per query batch: every cold row's emb + lex sig +
    # tech slots + scalars crosses host->device once per batch
    per_row = tier.emb.itemsize * dim + args.lex_dim + slots * 4 + 13
    block_bytes = per_row * tier.count
    p50 = float(np.median(times)) * 1e3
    print(f"capped query: p50 {p50:.0f} ms/batch over {args.iters} iters "
          f"(cold H2D ~{block_bytes / 1e6:.0f} MB/batch; "
          f"{args.batch / (p50 / 1e3):.1f} QPS)")
    print(f"note: tunnel H2D ~2.7 MB/s dominates here; at 10 GB/s PCIe "
          f"the same blocks cost ~{block_bytes / 10e9 * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
