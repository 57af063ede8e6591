"""Serial readback-overlap probe: does issuing copy_to_host_async()
right after enqueue hide the collect-time D2H request leg (~25 ms RTT)
behind device compute on the tunneled chip?

Variants (262k rows, batch 128, one compile):
  baseline      — call, then jax.device_get at collect
  cta_dispatch  — call, copy_to_host_async() immediately, device_get later
  cta_sleep     — same + 20 ms host sleep before device_get (models host
                  prepare of the next batch; shows the achievable floor)
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
packed = pack_queries(q_emb, sparse, sparse, q_tech,
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


d_res = jnp.asarray(packed)
jax.block_until_ready(d_res)
jax.device_get(call(d_res))  # compile + warm
rec = {}


def timeit(name, fn, n=20):
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        lat.append(time.perf_counter() - t0)
    rec[name] = round(float(np.percentile(lat, 50)) * 1e3, 1)


def baseline():
    out = call(d_res)
    jax.device_get(out)


timeit("baseline", baseline)


def cta_dispatch():
    out = call(d_res)
    try:
        out.copy_to_host_async()
    except Exception as e:  # record once if unsupported
        rec.setdefault("cta_error", repr(e))
    jax.device_get(out)


timeit("cta_dispatch", cta_dispatch)


def cta_sleep():
    out = call(d_res)
    try:
        out.copy_to_host_async()
    except Exception:
        pass
    time.sleep(0.020)
    jax.device_get(out)


timeit("cta_sleep", cta_sleep)


def baseline_sleep():
    out = call(d_res)
    time.sleep(0.020)
    jax.device_get(out)


timeit("baseline_sleep", baseline_sleep)

print(json.dumps(rec))
