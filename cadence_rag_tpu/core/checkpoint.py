"""Device-index checkpoint/restore.

The reference's durable search state IS Postgres; ours is device arrays, so
real checkpointing is required (SURVEY.md §5 checkpoint/resume): serialize
both corpora's arrays + id maps + lexical stats to host storage, restore on
start without replaying the ingest log. SQLite remains the source of truth
(ingest.rebuild_index_from_store is the slow-path recovery); a checkpoint
is the fast path for large corpora.

Format: one directory, ``meta.json`` + one ``.npz`` per corpus (npz instead
of orbax: index state is plain numpy, no pytrees/sharding metadata needed,
and restore must work without a device).

The IVF dense index is derived state and is NOT checkpointed; when
DENSE_IVF_ENABLED is on, serve startup rebuilds it from the restored
embeddings (serve/api.py:startup, scripts/build_ivf.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config import settings
from .index import DeviceIndexManager, get_index

FORMAT_VERSION = 1


def save_index(path: str, index: Optional[DeviceIndexManager] = None) -> Dict:
    index = index or get_index()
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    meta = {
        "format_version": FORMAT_VERSION,
        "embeddings_dim": int(settings.embeddings_dim),
        "lexical_dim": int(settings.lexical_dim),
        "tech_hash_slots": int(settings.tech_hash_slots),
        "call_capacity": index.call_capacity,
        "counts": {},
    }
    for corpus in (index.chunks, index.artifacts):
        arrays = corpus.state_arrays()
        np.savez(out / f"{corpus.name}.npz", **arrays)
        meta["counts"][corpus.name] = corpus.count
    (out / "meta.json").write_text(json.dumps(meta, indent=2))
    return meta


def restore_index(path: str, index: Optional[DeviceIndexManager] = None) -> Dict:
    index = index or get_index()
    src = Path(path)
    meta = json.loads((src / "meta.json").read_text())
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"index checkpoint format {meta.get('format_version')} != "
            f"{FORMAT_VERSION}"
        )
    for key, expected in (
        ("embeddings_dim", int(settings.embeddings_dim)),
        ("lexical_dim", int(settings.lexical_dim)),
        ("tech_hash_slots", int(settings.tech_hash_slots)),
    ):
        if meta[key] != expected:
            raise ValueError(
                f"checkpoint {key}={meta[key]} does not match settings "
                f"{key}={expected}"
            )
    for corpus in (index.chunks, index.artifacts):
        with np.load(src / f"{corpus.name}.npz") as data:
            corpus.load_state({k: data[k] for k in data.files})
    index.ensure_call_capacity(int(meta["call_capacity"]))
    return meta
