"""Full-stack serving benchmark: retrieve_evidence_batch end-to-end.

bench.py measures the device program alone; this measures the whole engine
path a real request takes — query featurization, filter resolution, planner
estimates, device dispatch, postprocessing, RRF, and (for evidence packs)
SQLite row fetches — so host overhead can't hide.

Usage: python -m cadence_rag_tpu.evals.serve_bench [--chunks 50000]
       [--batch 64] [--iters 10] [--style ids_only|evidence_pack_json]
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np


def _populate(n_chunks: int, n_calls: int = 200) -> None:
    """Direct device+store population (API-level ingest at this scale would
    dominate the setup time; the query path is what's measured)."""
    from ..config import settings
    from ..core.index import DocRow, get_index
    from ..ingest.ingest import persist_lexical_meta
    from ..store.db import get_store
    from ..utils.timeutil import now_utc, to_iso

    store = get_store()
    index = get_index()
    rng = np.random.default_rng(0)
    dim = int(settings.embeddings_dim)
    lex_dim = int(settings.lexical_dim)
    slots = int(settings.tech_hash_slots)

    call_ids = []
    with store.tx() as conn:
        for seq in range(n_calls):
            call_id = f"00000000-0000-4000-8000-{seq:012d}"
            conn.execute(
                "INSERT INTO calls (call_id, call_seq, started_at, title) "
                "VALUES (?,?,?,?)",
                (call_id, seq, to_iso(now_utc()), f"bench call {seq}"),
            )
            call_ids.append(call_id)
    index.ensure_call_capacity(n_calls)

    words = ["object", "store", "tiering", "latency", "rollback", "gateway",
             "cluster", "retry", "budget", "bake-off", "lenovo", "azure"]
    batch_rows = []
    with store.tx() as conn:
        for i in range(n_chunks):
            seq = i % n_calls
            text = (
                f"chunk {i} discussing {words[i % len(words)]} and "
                f"{words[(i * 7) % len(words)]} with ECONNRESET v2.{i % 9}.1"
            )
            cur = conn.execute(
                "INSERT INTO chunks (call_id, call_started_at, speaker, "
                "start_ts_ms, end_ts_ms, token_count, text, tech_tokens, "
                "lex_sig, lex_dl) VALUES (?,?,?,?,?,?,?,?,?,?)",
                (call_ids[seq], to_iso(now_utc()), "A", 0, 1000, 12, text,
                 "[]", np.zeros(lex_dim, np.int8).tobytes(), 10),
            )
            emb = rng.standard_normal(dim).astype(np.float32)
            emb /= np.linalg.norm(emb)
            sig = rng.integers(-4, 5, size=lex_dim).astype(np.int8)
            batch_rows.append(
                DocRow(
                    doc_id=cur.lastrowid, call_seq=seq,
                    started_sec=1_700_000_000 + i,
                    lex_sig=sig, lex_dl=10,
                    lex_touched=np.flatnonzero(sig)[:64].astype(np.int32),
                    tech=rng.integers(1, 5000, size=slots).astype(np.int32),
                    embedding=emb,
                )
            )
    for start in range(0, len(batch_rows), 4096):
        index.chunks.insert(batch_rows[start:start + 4096])
    # a small artifact corpus so the dual program runs realistically
    art_rows = []
    with store.tx() as conn:
        for i in range(max(n_chunks // 10, 16)):
            seq = i % n_calls
            cur = conn.execute(
                "INSERT INTO analysis_artifacts (call_id, call_started_at, "
                "kind, content, token_count, tech_tokens) VALUES (?,?,?,?,?,?)",
                (call_ids[seq], to_iso(now_utc()), "summary",
                 f"artifact {i} about the rollout", 6, "[]"),
            )
            conn.execute(
                "INSERT INTO artifact_chunks (artifact_id, call_id, "
                "call_started_at, kind, ordinal, content, token_count, "
                "tech_tokens, lex_sig, lex_dl) VALUES (?,?,?,?,?,?,?,?,?,?)",
                (cur.lastrowid, call_ids[seq], to_iso(now_utc()), "summary",
                 0, f"artifact {i} about the rollout", 6, "[]",
                 np.zeros(lex_dim, np.int8).tobytes(), 6),
            )
            emb = rng.standard_normal(dim).astype(np.float32)
            emb /= np.linalg.norm(emb)
            sig = rng.integers(-4, 5, size=lex_dim).astype(np.int8)
            art_rows.append(
                DocRow(
                    doc_id=i + 1, call_seq=seq,
                    started_sec=1_700_000_000 + i,
                    lex_sig=sig, lex_dl=6,
                    lex_touched=np.flatnonzero(sig)[:64].astype(np.int32),
                    tech=np.zeros(slots, np.int32), embedding=emb,
                )
            )
    index.artifacts.insert(art_rows)
    persist_lexical_meta(store, index.chunks)
    persist_lexical_meta(store, index.artifacts)


def run_serve_bench(n_chunks: int, batch: int, iters: int, style: str) -> dict:
    from ..config import settings
    from ..core.index import reset_index
    from ..store.db import reset_store

    workdir = Path(tempfile.mkdtemp(prefix="cadence_serve_bench_"))
    saved = {k: getattr(settings, k) for k in
             ("store_path", "embeddings_provider", "embeddings_base_url",
              "index_initial_capacity")}
    settings.store_path = str(workdir / "bench.db")
    settings.embeddings_provider = "stub"
    settings.embeddings_base_url = ""
    settings.index_initial_capacity = 4096
    reset_store()
    reset_index()
    try:
        from ..engine.retrieve import retrieve_evidence_batch
        from ..schemas import RetrieveRequest

        t0 = time.perf_counter()
        _populate(n_chunks)
        setup_s = time.perf_counter() - t0

        queries = [
            "ECONNRESET rollback on the object store gateway",
            "tiering latency cluster retry budget",
            "lenovo bake-off azure rollout",
            "v2.3.1 gateway retry",
        ]
        reqs = [
            RetrieveRequest(query=queries[i % len(queries)],
                            return_style=style)
            for i in range(batch)
        ]
        retrieve_evidence_batch(reqs)  # compile + warm
        retrieve_evidence_batch(reqs)
        latencies = []
        t0 = time.perf_counter()
        for _ in range(iters):
            t1 = time.perf_counter()
            retrieve_evidence_batch(reqs)
            latencies.append(time.perf_counter() - t1)
        total = time.perf_counter() - t0
        return {
            "chunks": n_chunks,
            "batch": batch,
            "style": style,
            "setup_s": round(setup_s, 1),
            "qps": round(batch * iters / total, 1),
            "p50_batch_ms": round(float(np.percentile(latencies, 50)) * 1e3, 2),
            "p50_per_query_ms": round(
                float(np.percentile(latencies, 50)) * 1e3 / batch, 3
            ),
        }
    finally:
        for k, v in saved.items():
            setattr(settings, k, v)
        reset_store()
        reset_index()
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    parser = argparse.ArgumentParser(description="full-stack serving bench")
    parser.add_argument("--chunks", type=int, default=50_000)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--style", default="ids_only",
                        choices=["ids_only", "evidence_pack_json"])
    args = parser.parse_args()
    print(json.dumps(run_serve_bench(
        args.chunks, args.batch, args.iters, args.style
    )))


if __name__ == "__main__":
    main()
