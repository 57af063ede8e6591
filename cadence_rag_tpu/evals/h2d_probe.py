"""Tunnel H2D latency/bandwidth curve: time block_until_ready(jnp.asarray)
at sizes from 64 KB to 32 MB, plus back-to-back async pairs (does the
tunnel pipeline transfers?). Informs the packed-buffer size budget."""
import json, time
import jax, jax.numpy as jnp
import numpy as np

rec = {}
for kb in (64, 256, 671, 1024, 4096, 32768):
    x = np.random.default_rng(0).integers(0, 255, size=kb * 1024, dtype=np.uint8)
    jax.block_until_ready(jnp.asarray(x))  # warm path
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(x))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50))
    rec[f"h2d_{kb}kb_p50_ms"] = round(p50 * 1e3, 1)
    rec[f"h2d_{kb}kb_mbps"] = round(kb / 1024 / p50, 1)
# two async back-to-back 671KB then block both: pipelined?
x = np.random.default_rng(1).integers(0, 255, size=671 * 1024, dtype=np.uint8)
lat = []
for _ in range(10):
    t0 = time.perf_counter()
    a = jnp.asarray(x); b = jnp.asarray(x)
    jax.block_until_ready((a, b))
    lat.append(time.perf_counter() - t0)
rec["h2d_2x671kb_p50_ms"] = round(float(np.percentile(lat, 50)) * 1e3, 1)
print(json.dumps(rec))
