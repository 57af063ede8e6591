"""Growth-compile prewarmer: compile the NEXT capacity's fused program
before the index doubles into it.

The fused /retrieve program (ops/pack.dual_corpus_retrieve_packed) is
compiled per (corpus capacity, batch, modes, ...) signature; capacity
growth therefore lands a fresh XLA compile on the first query after a
doubling — minutes at 1M scale through the tunneled chip. Measured without
prewarm (NOTES_DEV.md round-2 mixed read/write bench): an unthrottled
writer at 500k drove query p99 from 119 ms to 17.4 s, dominated by exactly
that recompile.

This module watches fill levels and, once a corpus crosses
``prewarm_fill_fraction`` of capacity, compiles the doubled-capacity
variant of every recently-served query signature in a background thread —
against throwaway zero arrays, so it takes NO corpus locks and never
touches serving state. jax's jit cache keys on (shapes, dtypes, static
args), so the real post-growth query hits the warm cache (verified by
test: post-growth dispatch adds no cache entry).

Memory: the dummy arrays transiently cost the next capacity's footprint —
within the 3x growth headroom operators already provision (NOTES_DEV.md
sizing caveat), because growth itself holds old+new buffers concurrently.

No reference counterpart (Postgres has no compile step); this is the
TPU-native analogue of index warm-up. SURVEY.md §5 failure-detection calls
for "device-OOM/recompile guards" — this is the recompile guard.
"""

from __future__ import annotations

import dataclasses
import logging
import threading
from typing import TYPE_CHECKING, Optional, Set, Tuple

from ..config import settings

if TYPE_CHECKING:  # pragma: no cover
    from .index import DeviceIndexManager

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class QuerySignature:
    """Everything (besides corpus capacities) that keys a fused-program
    compile: array dims/dtypes + the static arguments."""

    batch: int
    emb_dim: int
    q_feats: int
    tech_q: int
    n_calls: int
    chunk_ks: Tuple[int, int, int]
    artifact_ks: Tuple[int, int, int]
    chunk_mode: str
    artifact_mode: str
    recall_target: float
    dense_enabled: bool
    packed_bytes: int
    dim: int
    lex_dim: int
    tech_slots: int
    emb_dtype: str


class GrowthPrewarmer:
    _MAX_SIGS = 8

    def __init__(self, manager: "DeviceIndexManager"):
        self._manager = manager
        self._lock = threading.Lock()
        self._sigs: list[QuerySignature] = []
        self._warmed: Set[Tuple[QuerySignature, int, int]] = set()
        self._thread: Optional[threading.Thread] = None

    # -- bookkeeping -------------------------------------------------------
    def note_signature(self, sig: QuerySignature) -> None:
        """Record a served query signature (most-recent-first, bounded)."""
        with self._lock:
            if sig in self._sigs:
                self._sigs.remove(sig)
            self._sigs.insert(0, sig)
            del self._sigs[self._MAX_SIGS:]

    def _target_caps(self) -> Tuple[int, int]:
        frac = float(settings.prewarm_fill_fraction)
        min_cap = int(settings.prewarm_min_capacity)

        def target(corpus) -> int:
            cap = corpus.capacity
            if cap >= min_cap and corpus.count >= frac * cap:
                return cap * 2
            return cap

        return target(self._manager.chunks), target(self._manager.artifacts)

    # -- trigger -----------------------------------------------------------
    def maybe_prewarm(self) -> bool:
        """Spawn a background compile if a corpus is near a doubling and the
        next capacity's program isn't warm yet. Returns True if spawned."""
        if not settings.prewarm_growth_enabled:
            return False
        chunk_cap, art_cap = self._target_caps()
        if (chunk_cap == self._manager.chunks.capacity
                and art_cap == self._manager.artifacts.capacity):
            return False
        with self._lock:
            if self._thread is not None and self._thread.is_alive():
                return False
            pending = [
                sig for sig in self._sigs
                if (sig, chunk_cap, art_cap) not in self._warmed
            ]
            if not pending:
                return False
            for sig in pending:
                self._warmed.add((sig, chunk_cap, art_cap))
            self._thread = threading.Thread(
                target=self._compile_all,
                args=(pending, chunk_cap, art_cap),
                daemon=True,
                name="growth-prewarm",
            )
            self._thread.start()
            return True

    def wait(self, timeout: Optional[float] = None) -> None:
        thread = self._thread
        if thread is not None:
            thread.join(timeout)

    # -- compile -----------------------------------------------------------
    def _dummy_arrays(self, cap: int, sig: QuerySignature):
        import jax.numpy as jnp

        sharding = self._manager.chunks.row_sharding

        def place(arr):
            if sharding is None:
                return arr
            import jax

            return jax.device_put(arr, sharding)

        def place_1d(arr):
            if sharding is None:
                return arr
            import jax
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(
                arr, NamedSharding(sharding.mesh, PartitionSpec(sharding.spec[0]))
            )

        return (
            place(jnp.zeros((cap, sig.dim), dtype=sig.emb_dtype)),
            place(jnp.zeros((cap, sig.lex_dim), dtype=jnp.int8)),
            place(jnp.zeros((cap, sig.tech_slots), dtype=jnp.int32)),
            place_1d(jnp.zeros((cap,), dtype=jnp.int32)),
            place_1d(jnp.full((cap,), -(2**31), dtype=jnp.int32)),
            place_1d(jnp.zeros((cap,), dtype=jnp.bool_)),
        )

    def _compile_all(
        self, sigs, chunk_cap: int, art_cap: int
    ) -> None:
        import jax
        import jax.numpy as jnp

        from ..ops.pack import dual_corpus_retrieve_packed

        for sig in sigs:
            try:
                chunk_arrays = self._dummy_arrays(chunk_cap, sig)
                artifact_arrays = self._dummy_arrays(art_cap, sig)
                packed = jnp.zeros((sig.packed_bytes,), dtype=jnp.uint8)
                out = dual_corpus_retrieve_packed(
                    chunk_arrays, artifact_arrays, packed,
                    batch=sig.batch, emb_dim=sig.emb_dim,
                    q_feats=sig.q_feats, tech_q=sig.tech_q,
                    n_calls=sig.n_calls,
                    chunk_ks=sig.chunk_ks, artifact_ks=sig.artifact_ks,
                    chunk_mode=sig.chunk_mode,
                    artifact_mode=sig.artifact_mode,
                    recall_target=sig.recall_target,
                    dense_enabled=sig.dense_enabled,
                )
                jax.block_until_ready(out)
                logger.info(
                    "prewarm.compiled chunk_cap=%s art_cap=%s batch=%s "
                    "modes=%s/%s", chunk_cap, art_cap, sig.batch,
                    sig.chunk_mode, sig.artifact_mode,
                )
            except Exception:  # never fatal: growth just pays the compile
                logger.exception(
                    "prewarm.failed chunk_cap=%s art_cap=%s", chunk_cap,
                    art_cap,
                )
            finally:
                chunk_arrays = artifact_arrays = packed = None  # free HBM
