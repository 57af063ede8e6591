"""Isolate the fresh-input-buffer cost: (a) fresh asarray per iter but
program reads a RESIDENT buffer; (b) program reads the fresh buffer;
(c) resident only. Plus a depth-2 pipelined fresh-input loop."""
import json, time
import jax, jax.numpy as jnp
import numpy as np
from cadence_rag_tpu.config import settings
from cadence_rag_tpu.ops.pack import dual_corpus_retrieve_packed, pack_queries
from cadence_rag_tpu.core.index import get_index, reset_index
from cadence_rag_tpu.evals.synth import install_synthetic_corpus

settings.index_initial_capacity = 4096
settings.prewarm_growth_enabled = False
reset_index()
index = get_index()
index.ensure_call_capacity(1024)
install_synthetic_corpus(index.chunks, 262144, 1024, seed=0)
install_synthetic_corpus(index.artifacts, 26214, 1024, seed=1)

dim, F = 1024, int(settings.query_lex_features)
tech_q = int(settings.tech_hash_slots) * int(settings.tech_slot_capacity)
rng = np.random.default_rng(1)
batch = 128
q_emb = rng.standard_normal((batch, dim)).astype(np.float32)
sparse = (rng.integers(0, 4096, (batch, F)).astype(np.uint16),
          (rng.standard_normal((batch, F)) * 0.05).astype(np.float16))
q_tech = rng.integers(1, 5000, size=(batch, tech_q)).astype(np.int32)
packed = pack_queries(q_emb, sparse, sparse, q_tech,
                      np.ones((batch, 1024), dtype=bool),
                      np.full(batch, -2147483647, dtype=np.int32),
                      np.full(batch, 2**31 - 1, dtype=np.int32))

def call(p):
    return dual_corpus_retrieve_packed(
        index.chunks.device_arrays(), index.artifacts.device_arrays(), p,
        batch=batch, emb_dim=dim, q_feats=F, tech_q=tech_q, n_calls=1024,
        chunk_ks=(50,50,50), artifact_ks=(10,10,50),
        chunk_mode="ann", artifact_mode="ann", recall_target=0.95,
        fuse_rrf=True)

d_res = jnp.asarray(packed); jax.block_until_ready(d_res)
jax.block_until_ready(jax.tree_util.tree_leaves(call(d_res))[0])
rec = {}

def timeit(name, fn, n=20):
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        lat.append(time.perf_counter() - t0)
    rec[name] = round(float(np.percentile(lat, 50)) * 1e3, 1)

def fetch(out):
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)

timeit("resident", lambda: fetch(call(d_res)))
def fresh_unused():
    a = jnp.asarray(packed)   # fresh upload, program ignores it
    fetch(call(d_res))
    del a
timeit("fresh_upload_unused", fresh_unused)
def fresh_used():
    fetch(call(jnp.asarray(packed)))
timeit("fresh_upload_used", fresh_used)
# depth-2 pipelined fresh-input loop (what the server does)
def pipelined():
    outs = []
    t0 = time.perf_counter()
    n = 20
    for i in range(n):
        outs.append(call(jnp.asarray(packed)))
        if len(outs) > 2:
            fetch(outs.pop(0))
    while outs:
        fetch(outs.pop(0))
    return (time.perf_counter() - t0) / n * 1e3
rec["pipelined_fresh_per_batch_ms"] = round(pipelined(), 1)
print(json.dumps(rec))
