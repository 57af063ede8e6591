"""/retrieve orchestration: the reference's hot path, TPU-native.

Response-shape and ranking-semantics parity with the reference
(reference: app/retrieve.py:392-688):

- three lanes x two corpora, RRF (k=60) per corpus, lane top-ks
  50/10/50/10/50, budgets 8 items / 6000 chars, <=2 artifact chunks,
  <=2 quotes per call, 800-char snippets, `ids_only` and `debug` modes,
  dense degrade to lexical_only on provider failure;

but where the reference issues five SQL queries per request, all lanes for
a corpus execute as ONE jitted device program (ops/fused.py) and the
planner's candidate estimate is a host-mirror numpy pass instead of a
COUNT(*) round-trip.

Observability parity+: query_id per request, per-lane debug traces, a
notes.retrieval config snapshot, plus per-phase timings (SURVEY.md §5 asks
the TPU build to add kernel timing to the notes block).
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import settings
from ..core.index import CorpusIndex, get_index
from ..embed import EmbeddingError, embed_texts, embeddings_enabled
from ..ingest import featurize
from ..ingest.chunking import extract_tech_tokens
from ..logging_utils import get_logger
from ..ops.fusion import rrf_merge
from ..schemas import Budget, RetrieveRequest
from ..store.db import get_store
from .filters import ResolvedFilters, resolve_filters
from .planner import choose_dense_mode, recall_target_for_ef_search

logger = get_logger(__name__)

RRF_K = 60
CHUNK_BM25_TOPK = 50
ARTIFACT_BM25_TOPK = 10
DENSE_CHUNK_TOPK = 50
DENSE_ARTIFACT_TOPK = 10
TECH_TOPK = 50
MAX_ARTIFACTS = 2
MAX_QUOTES_PER_CALL = 2
SNIPPET_CHARS = 800


def _clip(text: str, max_chars: int) -> str:
    if max_chars <= 0:
        return ""
    if len(text) <= max_chars:
        return text
    return text[: max_chars - 1].rstrip() + "…"


LaneRows = List[Tuple[int, Optional[float]]]  # (doc_id, score) ranked


def _format_lanes(out: Dict[str, Any]) -> Dict[str, LaneRows]:
    lanes: Dict[str, LaneRows] = {}
    ids, scores = out["lex"]
    lanes["bm25"] = [(int(i), float(s)) for i, s in zip(ids[0], scores[0])]
    ids, _keys = out["tech"]
    lanes["tech_tokens"] = [(int(i), None) for i in ids[0]]
    if "dense" in out:
        ids, scores = out["dense"]
        lanes["dense"] = [(int(i), float(s)) for i, s in zip(ids[0], scores[0])]
    return lanes


def _debug_lane(rows: LaneRows, id_field: str) -> List[Dict[str, Any]]:
    return [
        {id_field: doc_id, "rank": rank, "score": score}
        for rank, (doc_id, score) in enumerate(rows, start=1)
    ]


def _fetch_chunk_rows(ids: Sequence[int]) -> Dict[int, Dict[str, Any]]:
    if not ids:
        return {}
    store = get_store()
    placeholders = ",".join("?" * len(ids))
    with store.read() as conn:
        rows = conn.execute(
            f"SELECT chunk_id, call_id, speaker, start_ts_ms, end_ts_ms, text "
            f"FROM chunks WHERE chunk_id IN ({placeholders})",
            [int(i) for i in ids],
        ).fetchall()
    return {int(r["chunk_id"]): dict(r) for r in rows}


def _fetch_artifact_rows(ids: Sequence[int]) -> Dict[int, Dict[str, Any]]:
    if not ids:
        return {}
    store = get_store()
    placeholders = ",".join("?" * len(ids))
    with store.read() as conn:
        rows = conn.execute(
            f"SELECT artifact_chunk_id, artifact_id, call_id, kind, content "
            f"FROM artifact_chunks WHERE artifact_chunk_id IN ({placeholders})",
            [int(i) for i in ids],
        ).fetchall()
    return {int(r["artifact_chunk_id"]): dict(r) for r in rows}


def retrieve_evidence(payload: RetrieveRequest) -> Dict[str, Any]:
    query_id = str(uuid.uuid4())
    query = payload.query.strip()
    budget = payload.budget or Budget()
    timings: Dict[str, float] = {}
    logger.info(
        "retrieve.start query_id=%s intent=%s return_style=%s debug=%s",
        query_id, payload.intent, payload.return_style, payload.debug,
    )

    if not query:
        if payload.return_style == "ids_only":
            return {"query_id": query_id, "retrieved_ids": []}
        return {
            "query_id": query_id,
            "intent": payload.intent,
            "budget": budget.model_dump(),
            "artifacts": [],
            "quotes": [],
            "notes": {"error": "empty query"},
        }

    store = get_store()
    index = get_index()

    tech_tokens = extract_tech_tokens(query)
    q_tech = featurize.query_tech_hashes(tech_tokens)

    dense_enabled = embeddings_enabled()
    dense_error: Optional[str] = None
    dense_model_id: Optional[str] = None
    q_emb: Optional[np.ndarray] = None
    t0 = time.perf_counter()
    if dense_enabled:
        try:
            embedded = embed_texts([query])
            dense_model_id = embedded.model
            q_emb = np.asarray(embedded.vectors[0], dtype=np.float32)
        except EmbeddingError as exc:
            dense_enabled = False
            dense_error = str(exc)
    timings["embed_ms"] = (time.perf_counter() - t0) * 1e3

    resolved = resolve_filters(store, payload.filters, index.call_capacity)

    chunk_candidates = artifact_candidates = 0
    chunk_mode: Optional[str] = None
    artifact_mode: Optional[str] = None
    if dense_enabled:
        chunk_candidates = index.chunks.estimate_candidates(
            resolved.allowed_calls, resolved.date_min, resolved.date_max
        )
        artifact_candidates = index.artifacts.estimate_candidates(
            resolved.allowed_calls, resolved.date_min, resolved.date_max
        )
        chunk_mode = choose_dense_mode(chunk_candidates, resolved.scoped)
        artifact_mode = choose_dense_mode(artifact_candidates, resolved.scoped)

    t0 = time.perf_counter()
    chunk_q_lex = featurize.query_lexical_vector(
        query, index.chunks.doc_freq, index.chunks.count
    )[None, :]
    artifact_q_lex = featurize.query_lexical_vector(
        query, index.artifacts.doc_freq, index.artifacts.count
    )[None, :]
    chunks_out, artifacts_out = index.query_both(
        q_emb[None, :] if (dense_enabled and q_emb is not None) else None,
        chunk_q_lex,
        artifact_q_lex,
        q_tech[None, :],
        resolved.allowed_calls[None, :],
        np.array([resolved.date_min], dtype=np.int32),
        np.array([resolved.date_max], dtype=np.int32),
        chunk_ks=(DENSE_CHUNK_TOPK, CHUNK_BM25_TOPK, TECH_TOPK),
        artifact_ks=(DENSE_ARTIFACT_TOPK, ARTIFACT_BM25_TOPK, TECH_TOPK),
        chunk_mode=chunk_mode or "exact",
        artifact_mode=artifact_mode or "exact",
        recall_target=recall_target_for_ef_search(
            settings.embeddings_hnsw_ef_search
        ),
    )
    chunk_lanes = _format_lanes(chunks_out)
    artifact_lanes = _format_lanes(artifacts_out)
    timings["device_ms"] = (time.perf_counter() - t0) * 1e3

    debug_payload = None
    if payload.debug:
        chunk_dbg = {
            name: _debug_lane(rows, "chunk_id")
            for name, rows in chunk_lanes.items()
        }
        artifact_dbg = {
            name: _debug_lane(rows, "artifact_chunk_id")
            for name, rows in artifact_lanes.items()
        }
        debug_payload = {
            "lanes": {"chunks": chunk_dbg, "artifacts": artifact_dbg},
            "limits": {
                "bm25_chunk_topk": CHUNK_BM25_TOPK,
                "bm25_artifact_chunk_topk": ARTIFACT_BM25_TOPK,
                "tech_token_topk": TECH_TOPK,
                "dense_chunk_topk": DENSE_CHUNK_TOPK if dense_enabled else 0,
                "dense_artifact_chunk_topk": (
                    DENSE_ARTIFACT_TOPK if dense_enabled else 0
                ),
            },
            "dense": {
                "enabled": dense_enabled,
                "model_id": dense_model_id,
                "error": dense_error,
                "modes": {"chunks": chunk_mode, "artifact_chunks": artifact_mode},
                "candidate_rows": {
                    "chunks": chunk_candidates,
                    "artifact_chunks": artifact_candidates,
                },
            },
            "timings_ms": timings,
        }

    chunk_ranked = rrf_merge(
        {name: [doc_id for doc_id, _ in rows]
         for name, rows in chunk_lanes.items()},
        k=RRF_K,
    )
    artifact_ranked = rrf_merge(
        {name: [doc_id for doc_id, _ in rows]
         for name, rows in artifact_lanes.items()},
        k=RRF_K,
    )

    reranked_from: Optional[int] = None
    if settings.rerank_enabled and chunk_ranked:
        from .rerank import rerank

        t0 = time.perf_counter()
        reranked_from = min(int(settings.rerank_topk), len(chunk_ranked))
        chunk_ranked = rerank(
            query, chunk_ranked, "chunks",
            index.chunks.doc_freq, index.chunks.count,
            topk=reranked_from,
            provider=settings.rerank_provider,
        )
        timings["rerank_ms"] = (time.perf_counter() - t0) * 1e3

    if payload.return_style == "ids_only":
        combined: List[Tuple[str, int, float]] = []
        for doc_id, _lanes, score in artifact_ranked:
            combined.append(("artifact_chunk", doc_id, score))
        for doc_id, _lanes, score in chunk_ranked:
            combined.append(("chunk", doc_id, score))
        kind_order = {"artifact_chunk": 0, "chunk": 1}
        combined.sort(key=lambda it: (-it[2], kind_order[it[0]], it[1]))
        response: Dict[str, Any] = {
            "query_id": query_id,
            "retrieved_ids": [f"{kind}:{doc_id}" for kind, doc_id, _ in combined],
        }
        if debug_payload is not None:
            response["debug"] = debug_payload
        logger.info(
            "retrieve.complete query_id=%s mode=ids_only ids=%s dense=%s",
            query_id, len(response["retrieved_ids"]), dense_enabled,
        )
        return response

    # ----- evidence pack under budget --------------------------------
    t0 = time.perf_counter()
    artifact_rows = _fetch_artifact_rows([doc_id for doc_id, _, _ in artifact_ranked])
    chunk_rows = _fetch_chunk_rows([doc_id for doc_id, _, _ in chunk_ranked])

    max_items = budget.max_evidence_items
    remaining_chars = budget.max_total_chars
    artifacts_out: List[Dict[str, Any]] = []
    quotes_out: List[Dict[str, Any]] = []
    evidence_count = 0
    max_artifacts = min(MAX_ARTIFACTS, max_items)

    for doc_id, lane_hits, _score in artifact_ranked:
        if evidence_count >= max_items or len(artifacts_out) >= max_artifacts:
            break
        if remaining_chars <= 0:
            break
        row = artifact_rows.get(doc_id)
        if row is None:
            continue
        snippet = _clip(row["content"], min(SNIPPET_CHARS, remaining_chars))
        remaining_chars -= len(snippet)
        artifacts_out.append(
            {
                "evidence_id": f"A-{doc_id}",
                "call_id": row["call_id"],
                "artifact_id": row["artifact_id"],
                "artifact_chunk_id": doc_id,
                "kind": row["kind"],
                "snippet": snippet,
                "why_relevant": " + ".join(sorted(lane_hits)),
            }
        )
        evidence_count += 1

    quotes_per_call: Dict[str, int] = {}
    for doc_id, lane_hits, _score in chunk_ranked:
        if evidence_count >= max_items:
            break
        if remaining_chars <= 0:
            break
        row = chunk_rows.get(doc_id)
        if row is None:
            continue
        call_id = row["call_id"]
        if quotes_per_call.get(call_id, 0) >= MAX_QUOTES_PER_CALL:
            continue
        snippet = _clip(row["text"], min(SNIPPET_CHARS, remaining_chars))
        remaining_chars -= len(snippet)
        quotes_out.append(
            {
                "evidence_id": f"Q-{doc_id}",
                "call_id": call_id,
                "chunk_id": doc_id,
                "speaker": row["speaker"],
                "start_ts_ms": row["start_ts_ms"],
                "end_ts_ms": row["end_ts_ms"],
                "snippet": snippet,
                "why_relevant": " + ".join(sorted(lane_hits)),
            }
        )
        quotes_per_call[call_id] = quotes_per_call.get(call_id, 0) + 1
        evidence_count += 1
    timings["pack_ms"] = (time.perf_counter() - t0) * 1e3

    response = {
        "query_id": query_id,
        "intent": payload.intent,
        "budget": budget.model_dump(),
        "artifacts": artifacts_out,
        "quotes": quotes_out,
        "notes": {
            "retrieval": {
                "planner": (
                    "lexical_only"
                    if not dense_enabled
                    else (
                        "ann"
                        if chunk_mode == "ann" or artifact_mode == "ann"
                        else "exact"
                    )
                ),
                "dense_topk": (
                    max(DENSE_CHUNK_TOPK, DENSE_ARTIFACT_TOPK)
                    if dense_enabled else 0
                ),
                "lex_topk": CHUNK_BM25_TOPK,
                "artifact_chunk_lex_topk": ARTIFACT_BM25_TOPK,
                "reranked_from": reranked_from,
                "bm25_chunk_topk": CHUNK_BM25_TOPK,
                "bm25_artifact_chunk_topk": ARTIFACT_BM25_TOPK,
                "tech_token_topk": TECH_TOPK,
                "tech_tokens": tech_tokens,
                "lanes": {
                    "bm25": True,
                    "tech_tokens": True,
                    "dense": dense_enabled,
                },
                "dense_model_id": dense_model_id,
                "dense_error": dense_error,
                "dense_modes": {
                    "chunks": chunk_mode,
                    "artifact_chunks": artifact_mode,
                },
                "dense_candidate_rows": {
                    "chunks": chunk_candidates,
                    "artifact_chunks": artifact_candidates,
                },
                "hnsw_ef_search": (
                    settings.embeddings_hnsw_ef_search if dense_enabled else None
                ),
                "ann_recall_target": (
                    recall_target_for_ef_search(settings.embeddings_hnsw_ef_search)
                    if dense_enabled else None
                ),
                "timings_ms": timings,
            }
        },
    }
    if debug_payload is not None:
        response["debug"] = debug_payload
    logger.info(
        "retrieve.complete query_id=%s artifacts=%s quotes=%s dense=%s",
        query_id, len(artifacts_out), len(quotes_out), dense_enabled,
    )
    return response
