"""Where does the growth stall go? On-chip phase timing of a capacity
doubling (VERDICT r4 item 2: the round-4 soak measured a 51.4 s worst
batch "around the growth copy + AOT-lowering window" — this probe breaks
that window into its parts so the fix targets the real cost).

Phases measured at --rows (default 524288) growing to the next capacity:

  alloc        jnp.zeros/full for the 6 new buffers at new cap
  copy_i       each _write_slab(new, old, 0) — first call at a fresh
               shape is compile+run; we time compile separately via a
               second growth at the same shapes (warm)
  insert_new   first _write_all_slabs at the new capacity (the insert
               that triggered growth pays this compile)
  query_new    first fused query at the new capacity, with the prewarmed
               AOT executable if available

Corpus content is generated ON DEVICE (nothing crosses the tunnel).

Usage:  timeout 1800 python -m cadence_rag_tpu.evals.growth_probe \
            --rows 524288 [--emb-dtype bfloat16]
Prints one JSON line per phase and a summary line.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    jax.block_until_ready(x)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=524288)
    parser.add_argument("--dim", type=int, default=1024)
    parser.add_argument("--lex-dim", type=int, default=4096)
    parser.add_argument("--tech-slots", type=int, default=16)
    parser.add_argument("--emb-dtype", default="bfloat16")
    args = parser.parse_args()

    from ..core import index as index_mod
    from ..core.index import CorpusIndex

    rows = args.rows
    cap0 = rows  # start exactly full so the next insert grows
    t0 = time.perf_counter()
    corpus = CorpusIndex(
        "chunks", dim=args.dim, lex_dim=args.lex_dim,
        tech_slots=args.tech_slots, capacity=cap0,
        emb_dtype=args.emb_dtype,
    )
    _sync(corpus.emb)
    print(json.dumps({"phase": "corpus_alloc_cap0",
                      "s": round(time.perf_counter() - t0, 3)}))

    # fill device content on device (host mirrors faked cheaply)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    emb = jax.random.normal(key, (cap0, args.dim), dtype=jnp.float32)
    corpus.emb = emb.astype(corpus.emb_dtype)
    corpus.started = jnp.ones((cap0,), jnp.int32)
    corpus.has_emb = jnp.ones((cap0,), jnp.bool_)
    _sync(corpus.emb)
    corpus.count = cap0
    corpus.h_started[:] = 1
    corpus.h_has_emb[:] = True
    corpus.h_ids[:] = np.arange(cap0)
    corpus.emb_rows = cap0
    print(json.dumps({"phase": "fill_on_device",
                      "s": round(time.perf_counter() - t0, 3)}))

    # -- phase: the raw _grow_to (alloc + 6 slab copies, cold compiles)
    from ..core.prewarm import plan_next_capacity

    new_cap = plan_next_capacity(corpus, cap0 + 1)
    print(json.dumps({"cap0": cap0, "new_cap": int(new_cap)}))

    t0 = time.perf_counter()
    old = (corpus.emb, corpus.lex, corpus.tech, corpus.call_idx,
           corpus.started, corpus.has_emb)
    corpus.capacity = new_cap
    corpus._alloc_device(new_cap)
    _sync(corpus.emb)
    t_alloc = time.perf_counter() - t0
    print(json.dumps({"phase": "alloc_new", "s": round(t_alloc, 3)}))

    names = ("emb", "lex", "tech", "call_idx", "started", "has_emb")
    copies = {}
    for name, buf in zip(names, old):
        t0 = time.perf_counter()
        setattr(corpus, name,
                index_mod._write_slab(getattr(corpus, name), buf, 0))
        _sync(getattr(corpus, name))
        copies[name] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"phase": f"copy_{name}", "s": copies[name]}))
    for attr in ("h_ids", "h_call", "h_started", "h_has_emb"):
        mirror = getattr(corpus, attr)
        grown = np.zeros(new_cap, dtype=mirror.dtype)
        grown[: mirror.shape[0]] = mirror
        setattr(corpus, attr, grown)

    # -- phase: first insert slab at the new capacity (cold compile of
    # _write_all_slabs at the new buffer shapes)
    n = 256
    padded = 256
    emb_p = np.zeros((padded, args.dim), np.float32)
    lex_p = np.zeros((padded, args.lex_dim), np.int8)
    tech_p = np.zeros((padded, args.tech_slots), np.int32)
    call_p = np.zeros(padded, np.int32)
    started_p = np.ones(padded, np.int32)
    has_p = np.ones(padded, bool)
    t0 = time.perf_counter()
    out = index_mod._write_all_slabs(
        corpus.emb, corpus.lex, corpus.tech, corpus.call_idx,
        corpus.started, corpus.has_emb,
        jnp.asarray(corpus._encode_emb(emb_p)), jnp.asarray(lex_p),
        jnp.asarray(tech_p), jnp.asarray(call_p),
        jnp.asarray(started_p), jnp.asarray(has_p), corpus.count,
    )
    _sync(out[0])
    (corpus.emb, corpus.lex, corpus.tech, corpus.call_idx,
     corpus.started, corpus.has_emb) = out
    corpus.count += n
    print(json.dumps({"phase": "insert_new_cap_cold",
                      "s": round(time.perf_counter() - t0, 3)}))

    t0 = time.perf_counter()
    out = index_mod._write_all_slabs(
        corpus.emb, corpus.lex, corpus.tech, corpus.call_idx,
        corpus.started, corpus.has_emb,
        jnp.asarray(corpus._encode_emb(emb_p)), jnp.asarray(lex_p),
        jnp.asarray(tech_p), jnp.asarray(call_p),
        jnp.asarray(started_p), jnp.asarray(has_p), corpus.count,
    )
    _sync(out[0])
    (corpus.emb, corpus.lex, corpus.tech, corpus.call_idx,
     corpus.started, corpus.has_emb) = out
    corpus.count += n
    print(json.dumps({"phase": "insert_new_cap_warm",
                      "s": round(time.perf_counter() - t0, 3)}))

    # -- phase: second growth at the SAME dtype/shape family (warm
    # compiles for alloc+copy, isolates pure copy/alloc device time)
    from ..core.prewarm import plan_next_capacity as pnc

    cap2 = pnc(corpus, new_cap + 1)
    if cap2 > new_cap:
        t0 = time.perf_counter()
        old = (corpus.emb, corpus.lex, corpus.tech, corpus.call_idx,
               corpus.started, corpus.has_emb)
        corpus.capacity = cap2
        corpus._alloc_device(cap2)
        for name, buf in zip(names, old):
            setattr(corpus, name,
                    index_mod._write_slab(getattr(corpus, name), buf, 0))
        _sync(corpus.emb)
        print(json.dumps({"phase": "second_growth_total",
                          "cap2": int(cap2),
                          "s": round(time.perf_counter() - t0, 3)}))

    print(json.dumps({
        "summary": {
            "alloc_s": round(t_alloc, 3),
            "copies_s": copies,
            "platform": str(jax.devices()[0].platform),
        }
    }))


if __name__ == "__main__":
    main()
