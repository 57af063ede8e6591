"""cadence_rag_tpu — a TPU-native hybrid-retrieval RAG framework.

A from-scratch rebuild of the capabilities of ``bgconley/cadence-rag``
(reference: /root/reference) designed TPU-first:

- The retrieval core (dense cosine top-k, lexical BM25-style scoring,
  exact tech-token matching, RRF fusion, filter scoping) executes as a
  single jitted XLA program over HBM-resident index state instead of five
  sequential SQL queries against Postgres extensions
  (reference: app/retrieve.py:392-688).
- Index state is capacity-padded device arrays (embeddings, int8 lexical
  signatures, token-hash tables, call metadata) sharded over a
  ``jax.sharding.Mesh`` when the corpus outgrows one chip.
- Host-side subsystems (metadata store, ingest pipelines, drop-folder job
  queue, HTTP API, eval gates) reproduce the reference's behavioral
  contracts without Postgres/Redis: SQLite + an in-process durable queue.
"""

__version__ = "0.1.0"

import os as _os

_force = _os.environ.get("CADENCE_FORCE_PLATFORM", "").strip()
if _force:
    # Pin the JAX platform before any backend use. Exists because env
    # JAX_PLATFORMS is ignored by some PJRT plugins (the axon TPU tunnel
    # — NOTES_DEV.md), yet deployment children (scripts/serve_all.py
    # workers, CI subprocesses) must be able to stay off the device the
    # api process owns.
    import jax as _jax

    _jax.config.update("jax_platforms", _force)
