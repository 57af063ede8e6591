"""Concurrency stress: concurrent ingest + retrieve must never crash or
return corrupted results (single-writer locks in core/index.py; the
reference delegates this to Postgres transactions — SURVEY.md §5)."""

import threading

import pytest

from cadence_rag_tpu.embed.pipeline import run_embedding_backfill
from cadence_rag_tpu.engine.retrieve import retrieve_evidence
from cadence_rag_tpu.ingest.ingest import ingest_transcript
from cadence_rag_tpu.schemas import CallRef, ChunkingOptions, RetrieveRequest, UtteranceIn

OPTS = ChunkingOptions(target_tokens=10, max_tokens=30, overlap_tokens=0)


class TestConcurrentIngestRetrieve:
    def test_parallel_writers_and_readers(self, tmp_store):
        ingest_transcript(
            CallRef(external_id="seed"),
            [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                         text="ECONNRESET on the object store")],
            OPTS,
        )
        run_embedding_backfill(batch_size=8)

        errors = []
        stop = threading.Event()

        def writer(worker_id):
            try:
                for i in range(8):
                    ingest_transcript(
                        CallRef(external_id=f"w{worker_id}-{i}"),
                        [UtteranceIn(
                            speaker="B", start_ts_ms=0, end_ts_ms=900,
                            text=f"writer {worker_id} message {i} about "
                                 f"SSD tiering and ECONNRESET",
                        )],
                        OPTS,
                    )
            except Exception as exc:  # noqa: BLE001
                errors.append(("writer", worker_id, repr(exc)))

        def reader(worker_id):
            try:
                while not stop.is_set():
                    resp = retrieve_evidence(
                        RetrieveRequest(query="ECONNRESET object store",
                                        return_style="ids_only")
                    )
                    assert isinstance(resp["retrieved_ids"], list)
                    # every returned id must decode to kind:int
                    for rid in resp["retrieved_ids"]:
                        kind, _, num = rid.partition(":")
                        assert kind in ("chunk", "artifact_chunk")
                        int(num)
            except Exception as exc:  # noqa: BLE001
                errors.append(("reader", worker_id, repr(exc)))

        writers = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
        readers = [threading.Thread(target=reader, args=(r,)) for r in range(2)]
        for t in readers:
            t.start()
        for t in writers:
            t.start()
        for t in writers:
            t.join(timeout=120)
        stop.set()
        for t in readers:
            t.join(timeout=30)
        assert not errors, errors

        # all writes landed
        from cadence_rag_tpu.core.index import get_index

        assert get_index().chunks.count >= 1 + 3 * 8
        resp = retrieve_evidence(
            RetrieveRequest(query="SSD tiering", return_style="ids_only")
        )
        assert resp["retrieved_ids"]

    def test_readers_with_deletes_and_compaction(self, tmp_store):
        """Queries overlap deletes + an explicit compaction (positions
        remapped mid-flight): the (h_ids, count) snapshot taken under the
        dispatch lock must keep id mapping consistent."""
        from cadence_rag_tpu.core.index import get_index
        from cadence_rag_tpu.ingest.ingest import delete_call

        call_ids = []
        for i in range(16):
            cid, _, _ = ingest_transcript(
                CallRef(external_id=f"dc-{i}"),
                [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                             text=f"delete-race {i} about SSD tiering "
                                  f"ECONNRESET v2.{i % 9}.1")],
                OPTS,
            )
            call_ids.append(cid)
        run_embedding_backfill(batch_size=16)

        errors = []
        stop = threading.Event()

        def reader(worker_id):
            try:
                while not stop.is_set():
                    resp = retrieve_evidence(
                        RetrieveRequest(query="SSD tiering ECONNRESET",
                                        return_style="ids_only")
                    )
                    for rid in resp["retrieved_ids"]:
                        kind, _, num = rid.partition(":")
                        assert kind in ("chunk", "artifact_chunk")
                        int(num)
            except Exception as exc:  # noqa: BLE001
                errors.append(("reader", worker_id, repr(exc)))

        def deleter():
            try:
                index = get_index()
                for cid in call_ids[:8]:
                    delete_call(cid)
                index.chunks.compact()
                index.artifacts.compact()
            except Exception as exc:  # noqa: BLE001
                errors.append(("deleter", repr(exc)))

        readers = [threading.Thread(target=reader, args=(r,)) for r in range(2)]
        d = threading.Thread(target=deleter)
        for t in readers:
            t.start()
        d.start()
        d.join(timeout=120)
        stop.set()
        for t in readers:
            t.join(timeout=30)
        assert not errors, errors
        resp = retrieve_evidence(
            RetrieveRequest(query="SSD tiering ECONNRESET",
                            return_style="ids_only")
        )
        # only surviving calls' chunks remain
        assert resp["retrieved_ids"]
        from cadence_rag_tpu.store.db import get_store

        with get_store().read() as conn:
            live = {
                f"chunk:{r['chunk_id']}" for r in conn.execute(
                    "SELECT chunk_id FROM chunks"
                ).fetchall()
            }
        for rid in resp["retrieved_ids"]:
            if rid.startswith("chunk:"):
                assert rid in live, rid
