"""A/B the dispatch-time readback prefetch (READBACK_PREFETCH_ENABLED,
core/index.query_both_packed_async): serial + pipelined depth-2/3
full-stack QPS with the flag off vs on, one process, one compile.

Usage (on-chip): timeout 1800 python -m cadence_rag_tpu.evals.cta_ab
    [--n 262144] [--batch 128] [--iters 20] [--trials 3]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import time
from typing import Dict

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=262144)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--lex-dim", type=int, default=4096)
    args = parser.parse_args()

    import bench as bench_mod

    from ..config import settings
    from ..engine.retrieve import retrieve_evidence_batch
    from .fullstack_profile import _phase_timeline, _requests

    index, workdir = bench_mod.setup_index(args.n, args.lex_dim)
    out: Dict = {"n": args.n, "batch": args.batch, "iters": args.iters}
    try:
        retrieve_evidence_batch(_requests(args.batch))  # compile
        retrieve_evidence_batch(_requests(args.batch))  # warm

        def serial_trial() -> float:
            reqs = _requests(args.batch, salt=int(time.time()) % 997)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                retrieve_evidence_batch(reqs)
            return args.batch * args.iters / (time.perf_counter() - t0)

        # interleave off/on trials so tunnel drift hits both equally
        runs = {"off": [], "on": []}
        for _ in range(args.trials):
            for tag, flag in (("off", False), ("on", True)):
                settings.readback_prefetch_enabled = flag
                runs[tag].append(round(serial_trial(), 1))
        for tag in ("off", "on"):
            out[f"serial_{tag}"] = {
                "qps_runs": runs[tag],
                "qps_median": round(float(np.median(runs[tag])), 1),
            }
        for tag, flag in (("off", False), ("on", True)):
            settings.readback_prefetch_enabled = flag
            for depth in (2, 3):
                t = _phase_timeline(args.batch, args.iters, depth)
                out[f"pipelined_{tag}_d{depth}"] = {
                    "qps": t["qps"], "enqueue_s": t["enqueue_s"],
                    "finish_s": t["finish_s"],
                    "host_idle_s": t["host_idle_s"],
                }
        settings.readback_prefetch_enabled = True
        print(json.dumps(out))
    finally:
        import shutil

        from ..core.index import reset_index
        from ..store.db import reset_store

        reset_store()
        reset_index()
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
