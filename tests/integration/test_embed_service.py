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
