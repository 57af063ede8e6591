"""Why does a fresh packed-buffer upload cost ~14 ms in the serving loop
when raw reused-buffer H2D of the same bytes is 0.8 ms (h2d_probe)?

Variants, all in one process at 262k rows / batch 128 (one compile):
  resident           — input already on device (floor)
  fresh_asarray      — NEW numpy buffer each iter, jnp.asarray, call
  reused_asarray     — SAME numpy buffer each iter (mutated), asarray
  numpy_direct       — NEW numpy buffer passed straight into the jit
  device_put_nb      — NEW buffer via jax.device_put (no block), call
Distinguishes per-RPC quantum vs host-buffer registration (pinning)
cost vs sync-vs-async staging. Informs the pack-path fix.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from cadence_rag_tpu.config import settings
from cadence_rag_tpu.core.index import get_index, reset_index
from cadence_rag_tpu.evals.synth import install_synthetic_corpus
from cadence_rag_tpu.ops.pack import dual_corpus_retrieve_packed, pack_queries

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


def fresh_packed():
    return pack_queries(q_emb, sparse, sparse, q_tech,
                        np.ones((batch, 1024), dtype=bool),
                        np.full(batch, -2147483647, dtype=np.int32),
                        np.full(batch, 2**31 - 1, dtype=np.int32))


def call(p):
    return dual_corpus_retrieve_packed(
        index.chunks.device_arrays(), index.artifacts.device_arrays(), p,
        batch=batch, emb_dim=dim, q_feats=F, tech_q=tech_q, n_calls=1024,
        chunk_ks=(50, 50, 50), artifact_ks=(10, 10, 50),
        chunk_mode="ann", artifact_mode="ann", recall_target=0.95,
        fuse_rrf=True)


def fetch(out):
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)


packed0 = fresh_packed()
d_res = jnp.asarray(packed0)
jax.block_until_ready(d_res)
fetch(call(d_res))          # compile + warm
fetch(call(packed0))        # warm the numpy-direct signature too
rec = {}


def timeit(name, fn, n=20):
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        lat.append(time.perf_counter() - t0)
    rec[name] = round(float(np.percentile(lat, 50)) * 1e3, 1)


timeit("resident", lambda: fetch(call(d_res)))


def fresh_asarray():
    fetch(call(jnp.asarray(fresh_packed())))


timeit("fresh_asarray", fresh_asarray)

reuse_buf = fresh_packed()


def reused_asarray():
    reuse_buf[0] ^= 1  # mutate so the tunnel can't dedupe content
    fetch(call(jnp.asarray(reuse_buf)))


timeit("reused_asarray", reused_asarray)


def numpy_direct():
    fetch(call(fresh_packed()))


timeit("numpy_direct", numpy_direct)


def device_put_nb():
    d = jax.device_put(fresh_packed())
    fetch(call(d))


timeit("device_put_nb", device_put_nb)

print(json.dumps(rec))
