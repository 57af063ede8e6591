"""Real-transport test: the aiohttp binding end-to-end, including the
micro-batched /retrieve fast path (serve/http.py + serve/batcher.py)."""

import asyncio
import json

import pytest

from cadence_rag_tpu.embed.pipeline import run_embedding_backfill
from cadence_rag_tpu.ingest.ingest import ingest_transcript
from cadence_rag_tpu.schemas import CallRef, ChunkingOptions, UtteranceIn


@pytest.fixture()
def corpus(tmp_store, monkeypatch):
    monkeypatch.setattr(tmp_store, "retrieve_batch_window_ms", 20)
    ingest_transcript(
        CallRef(external_id="http-1"),
        [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                     text="ECONNRESET traced to the object store gateway")],
        ChunkingOptions(target_tokens=10, max_tokens=30, overlap_tokens=0),
    )
    run_embedding_backfill(batch_size=8)
    return tmp_store


class TestAiohttpBinding:
    def test_real_http_roundtrip_with_batching(self, corpus):
        from aiohttp.test_utils import TestClient as AioClient, TestServer

        from cadence_rag_tpu.serve.http import make_app

        async def scenario():
            app = make_app()
            async with AioClient(TestServer(app)) as client:
                # health through the generic router path
                resp = await client.get("/health")
                assert resp.status == 200
                body = await resp.json()
                assert body["status"] == "ok"

                # concurrent DISTINCT retrieves share a micro-batch
                # through the batcher fast path (identical ones would
                # additionally coalesce to one plan — covered in
                # test_batcher.py)
                async def one(i):
                    r = await client.post(
                        "/retrieve",
                        json={"query": f"ECONNRESET object store {i}"},
                    )
                    assert r.status == 200
                    return await r.json()

                results = await asyncio.gather(*(one(i) for i in range(3)))
                return results

        results = asyncio.run(scenario())
        assert len(results) == 3
        for body in results:
            assert body["quotes"], body
        batch_sizes = {
            b["notes"]["retrieval"]["timings_ms"].get("device_batch")
            for b in results
        }
        assert max(batch_sizes) >= 2.0  # at least two shared a dispatch

    def test_invalid_json_400(self, corpus):
        from aiohttp.test_utils import TestClient as AioClient, TestServer

        from cadence_rag_tpu.serve.http import make_app

        async def scenario():
            app = make_app()
            async with AioClient(TestServer(app)) as client:
                resp = await client.post(
                    "/retrieve",
                    data=b"{not json",
                    headers={"Content-Type": "application/json"},
                )
                return resp.status

        assert asyncio.run(scenario()) == 400

    def test_batcher_validation_422(self, corpus):
        from aiohttp.test_utils import TestClient as AioClient, TestServer

        from cadence_rag_tpu.serve.http import make_app

        async def scenario():
            app = make_app()
            async with AioClient(TestServer(app)) as client:
                resp = await client.post("/retrieve", json={"nope": 1})
                return resp.status

        assert asyncio.run(scenario()) == 422
