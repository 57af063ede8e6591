"""The /embed service serves the reference's exact wire contract, and our
own HTTP provider can consume it (self-hosting loop)."""

import asyncio

import numpy as np
import pytest


class TestEmbedService:
    def test_contract_and_self_consumption(self, tmp_store, monkeypatch):
        from aiohttp.test_utils import TestClient as AioClient, TestServer

        from cadence_rag_tpu.serve.embed_service import make_embed_app

        async def scenario():
            app = make_embed_app("stub")
            async with AioClient(TestServer(app)) as client:
                resp = await client.get("/health")
                assert resp.status == 200

                resp = await client.post("/embed", json={
                    "texts": ["hello world", "object store"],
                    "model": "whatever",
                })
                assert resp.status == 200
                body = await resp.json()
                assert len(body["embeddings"]) == 2
                assert len(body["embeddings"][0]) == int(
                    tmp_store.embeddings_dim
                )
                norm = float(np.linalg.norm(body["embeddings"][0]))
                assert norm == pytest.approx(1.0, abs=1e-3)

                resp = await client.post("/embed", json={"texts": []})
                assert resp.status == 400
                return body

        asyncio.run(scenario())


class TestSelfHostingLoop:
    def test_http_provider_consumes_own_service(self, tmp_store, monkeypatch):
        """Full loop: ingest -> backfill through EMBEDDINGS_BASE_URL pointing
        at our own /embed service over a real socket (the reference's exact
        integration topology, with this framework on both ends)."""
        import threading

        from aiohttp.test_utils import TestServer

        from cadence_rag_tpu.serve.embed_service import make_embed_app

        started = threading.Event()
        holder = {}

        def run_server():
            loop = asyncio.new_event_loop()
            asyncio.set_event_loop(loop)
            server = TestServer(make_embed_app("stub"))
            loop.run_until_complete(server.start_server())
            holder["port"] = server.port
            holder["loop"] = loop
            holder["server"] = server
            started.set()
            loop.run_forever()

        thread = threading.Thread(target=run_server, daemon=True)
        thread.start()
        assert started.wait(timeout=30)

        monkeypatch.setattr(tmp_store, "embeddings_provider", "http")
        monkeypatch.setattr(
            tmp_store, "embeddings_base_url",
            f"http://127.0.0.1:{holder['port']}",
        )
        from cadence_rag_tpu.embed.pipeline import run_embedding_backfill
        from cadence_rag_tpu.ingest.ingest import ingest_transcript
        from cadence_rag_tpu.schemas import CallRef, ChunkingOptions, UtteranceIn

        ingest_transcript(
            CallRef(external_id="loop-1"),
            [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                         text="self hosted embedding loop")],
            ChunkingOptions(target_tokens=5, max_tokens=20, overlap_tokens=0),
        )
        summary = run_embedding_backfill(batch_size=4)
        assert summary.rows_updated >= 1
        assert summary.model_used == "hash-embedder-v1"

        holder["loop"].call_soon_threadsafe(holder["loop"].stop)
