"""What does a growth-prewarm AOT compile cost the SERVING thread?

The round-4 soak saw one 51.4 s batch "around the growth copy +
AOT-lowering window" while the growth copy itself measures ~6 s cold
(evals/growth_probe.py). Two suspects remain, both measured here against
a live query loop:

1. client-side LOWERING of the 1M fused program (Python tracing + C++
   MLIR emission, which holds the GIL) — starves the serving thread;
2. the remote compile RPC — if the tunnel serializes it with device
   dispatches, queries freeze for the full XLA compile.

Method: a ticker thread runs small device programs in a loop and records
inter-completion gaps; the main thread then runs lower() and compile()
for the doubled-capacity program. Max gap during each phase = the worst
query stall that phase can cause.

Usage: timeout 1800 python -m cadence_rag_tpu.evals.prewarm_probe \
           [--rows 524288] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=524288)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--dim", type=int, default=1024)
    parser.add_argument("--lex-dim", type=int, default=4096)
    args = parser.parse_args()

    from ..config import settings
    from ..ops.pack import dual_corpus_retrieve_packed

    dim, lex_dim = args.dim, args.lex_dim
    tech_slots = int(settings.tech_hash_slots)
    tech_q = tech_slots * int(settings.tech_slot_capacity)
    F = int(settings.query_lex_features)
    n_calls = 1024
    batch = args.batch
    cap = args.rows * 2  # the doubled capacity being prewarmed
    art_cap = max(args.rows // 4, 4096)

    # ticker: a small real device program (matmul) looping; gaps in its
    # completion times = serving-thread stalls
    x = jnp.ones((256, 256), jnp.float32)
    tick_fn = jax.jit(lambda a: (a @ a).sum())
    jax.block_until_ready(tick_fn(x))
    gaps: list = []
    stop = threading.Event()
    phase = {"name": "idle"}
    records: dict = {}

    def ticker():
        last = time.perf_counter()
        while not stop.is_set():
            jax.block_until_ready(tick_fn(x))
            now = time.perf_counter()
            gaps.append((phase["name"], now - last))
            last = now
            time.sleep(0.005)

    t = threading.Thread(target=ticker, daemon=True)
    t.start()
    time.sleep(1.0)

    def specs(c):
        return (
            jax.ShapeDtypeStruct((c, dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((c, lex_dim), jnp.int8),
            jax.ShapeDtypeStruct((c, tech_slots), jnp.int32),
            jax.ShapeDtypeStruct((c,), jnp.int32),
            jax.ShapeDtypeStruct((c,), jnp.int32),
            jax.ShapeDtypeStruct((c,), jnp.bool_),
        )

    # pack_queries layout size (ops/pack._unpack static offsets)
    pbytes = batch * (
        dim * 2 + 4 * F * 2 + tech_q * 4 + n_calls + 8
    )
    packed_spec = jax.ShapeDtypeStruct((pbytes,), jnp.uint8)

    phase["name"] = "lower"
    t0 = time.perf_counter()
    lowered = dual_corpus_retrieve_packed.lower(
        specs(cap), specs(art_cap), packed_spec,
        batch=batch, emb_dim=dim, q_feats=F, tech_q=tech_q,
        n_calls=n_calls, chunk_ks=(50, 50, 50), artifact_ks=(10, 10, 50),
        chunk_mode="ann", artifact_mode="ann", recall_target=0.95,
        dense_enabled=True, fuse_rrf=True,
    )
    records["lower_s"] = round(time.perf_counter() - t0, 3)

    phase["name"] = "compile"
    t0 = time.perf_counter()
    executable = lowered.compile()
    records["compile_s"] = round(time.perf_counter() - t0, 3)
    del executable

    phase["name"] = "post"
    time.sleep(2.0)
    stop.set()
    t.join(timeout=10)

    for name in ("idle", "lower", "compile", "post"):
        ph = [g for p, g in gaps if p == name]
        if ph:
            records[f"tick_gap_{name}_p50_ms"] = round(
                float(np.percentile(ph, 50)) * 1e3, 1
            )
            records[f"tick_gap_{name}_max_ms"] = round(
                float(max(ph)) * 1e3, 1
            )
            records[f"ticks_{name}"] = len(ph)
    records["platform"] = str(jax.devices()[0].platform)
    print(json.dumps(records))


if __name__ == "__main__":
    main()
