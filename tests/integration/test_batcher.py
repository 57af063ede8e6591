"""Async micro-batcher: concurrent submits coalesce into one device batch."""

import asyncio

import pytest

from cadence_rag_tpu.embed.pipeline import run_embedding_backfill
from cadence_rag_tpu.ingest.ingest import ingest_transcript
from cadence_rag_tpu.schemas import CallRef, ChunkingOptions, RetrieveRequest, UtteranceIn
from cadence_rag_tpu.serve.batcher import RetrieveBatcher


@pytest.fixture()
def corpus(tmp_store):
    ingest_transcript(
        CallRef(external_id="bt-1"),
        [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                     text="ECONNRESET on the object store gateway")],
        ChunkingOptions(target_tokens=10, max_tokens=30, overlap_tokens=0),
    )
    run_embedding_backfill(batch_size=8)
    return tmp_store


class TestBatcher:
    def test_concurrent_requests_share_dispatch(self, corpus):
        async def scenario():
            batcher = RetrieveBatcher(window_ms=50)
            reqs = [
                RetrieveRequest(query=f"ECONNRESET object store {i}")
                for i in range(4)
            ]
            return await asyncio.gather(*(batcher.submit(r) for r in reqs))

        responses = asyncio.run(scenario())
        assert len(responses) == 4
        batch_sizes = {
            r["notes"]["retrieval"]["timings_ms"].get("device_batch")
            for r in responses
        }
        assert batch_sizes == {4.0}, batch_sizes
        assert all(r["quotes"] for r in responses)

    def test_identical_concurrent_requests_coalesce(self, corpus):
        """A thundering herd of the SAME query through the batcher
        executes once: all callers answered, one-row device batch."""
        async def scenario():
            batcher = RetrieveBatcher(window_ms=50)
            reqs = [
                RetrieveRequest(query="ECONNRESET object store")
                for _ in range(4)
            ]
            return await asyncio.gather(*(batcher.submit(r) for r in reqs))

        responses = asyncio.run(scenario())
        assert len(responses) == 4
        batch_sizes = {
            r["notes"]["retrieval"]["timings_ms"].get("device_batch")
            for r in responses
        }
        assert batch_sizes == {1.0}, batch_sizes
        assert all(r["quotes"] for r in responses)
        assert len({r["query_id"] for r in responses}) == 4

    def test_max_batch_flushes_early(self, corpus):
        async def scenario():
            batcher = RetrieveBatcher(window_ms=10_000, max_batch=2)
            reqs = [RetrieveRequest(query="ECONNRESET") for _ in range(2)]
            return await asyncio.wait_for(
                asyncio.gather(*(batcher.submit(r) for r in reqs)),
                timeout=30,
            )

        responses = asyncio.run(scenario())
        assert len(responses) == 2


class TestMidDispatchArrival:
    def test_request_arriving_mid_dispatch_is_flushed(self, tmp_store,
                                                      monkeypatch):
        """A submit landing while the delayed flusher is awaiting the
        device dispatch must still be dispatched (regression: it used to
        hang forever because no new flusher was armed)."""
        import asyncio
        import time

        import cadence_rag_tpu.serve.batcher as mod
        from cadence_rag_tpu.schemas import RetrieveRequest
        from cadence_rag_tpu.serve.batcher import RetrieveBatcher

        calls = []

        def fake_dispatch(payloads):
            calls.append(len(payloads))
            return payloads

        def slow_finish(handle):
            time.sleep(0.3)  # device time; runs on the engine thread
            return [{"retrieved_ids": []} for _ in handle]

        import cadence_rag_tpu.engine.retrieve as eng

        monkeypatch.setattr(eng, "dispatch_evidence_batch", fake_dispatch)
        monkeypatch.setattr(eng, "finish_evidence_batch", slow_finish)

        async def scenario():
            batcher = RetrieveBatcher(window_ms=50, max_batch=64)
            t1 = asyncio.create_task(
                batcher.submit(RetrieveRequest(query="one"))
            )
            # let the flusher fire and enter the slow dispatch
            await asyncio.sleep(0.15)
            t2 = asyncio.create_task(
                batcher.submit(RetrieveRequest(query="two"))
            )
            await asyncio.wait_for(asyncio.gather(t1, t2), timeout=2.0)

        asyncio.run(scenario())
        assert calls == [1, 1], calls
