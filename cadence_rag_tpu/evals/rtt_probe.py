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

# warm both paths
jax.block_until_ready(call(jnp.asarray(packed)))
jax.block_until_ready(call(packed))
rec = {}
for name, arg_fn in (("prestaged", lambda: jnp.asarray(packed)),
                     ("numpy_direct", lambda: packed)):
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = call(arg_fn())
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        lat.append(time.perf_counter() - t0)
    rec[name + "_p50_ms"] = round(float(np.percentile(lat, 50)) * 1e3, 1)
# pre-staged where the stage happens OUTSIDE the timed loop (a pipelined server)
d = jnp.asarray(packed); jax.block_until_ready(d)
lat = []
for _ in range(20):
    t0 = time.perf_counter()
    out = call(d)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    lat.append(time.perf_counter() - t0)
rec["resident_p50_ms"] = round(float(np.percentile(lat, 50)) * 1e3, 1)
print(json.dumps(rec))
