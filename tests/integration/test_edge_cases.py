"""Edge cases: empty index, unicode content, oversized artifacts, zero-hit
queries."""

import pytest

from cadence_rag_tpu.serve.testing import TestClient


@pytest.fixture()
def client(tmp_store):
    return TestClient()


class TestEmptyIndex:
    def test_retrieve_on_empty_store(self, client):
        resp = client.post("/retrieve", json={"query": "anything at all"})
        assert resp.status_code == 200
        body = resp.json()
        assert body["quotes"] == [] and body["artifacts"] == []

    def test_ids_only_on_empty_store(self, client):
        resp = client.post(
            "/retrieve",
            json={"query": "anything", "return_style": "ids_only"},
        )
        assert resp.json()["retrieved_ids"] == []

    def test_list_calls_empty(self, client):
        body = client.get("/calls").json()
        assert body == {"items": [], "next_cursor": None}


class TestUnicodeAndScale:
    def test_unicode_transcript_roundtrip(self, client):
        resp = client.post("/ingest/transcript", json={
            "call_ref": {"external_id": "uni-1"},
            "transcript": {"format": "json_turns", "content": [
                {"speaker": "Göran", "start_ts_ms": 0, "end_ts_ms": 900,
                 "text": "naïve café 模型 testing — ECONNRESET déjà vu"},
            ]},
        })
        assert resp.status_code == 200, resp.json()
        body = client.post(
            "/retrieve", json={"query": "ECONNRESET café"}
        ).json()
        assert body["quotes"]
        assert "café" in body["quotes"][0]["snippet"]

    def test_large_artifact_chunked_and_clipped(self, client):
        paragraphs = "\n\n".join(
            f"Paragraph {i} about the rollout of v2.{i}.0 and its impact."
            for i in range(50)
        )
        resp = client.post("/ingest/analysis", json={
            "call_ref": {"external_id": "big-1"},
            "artifacts": [{"kind": "summary", "content": paragraphs}],
        })
        assert resp.status_code == 200
        body = client.post(
            "/retrieve", json={"query": "rollout of v2.7.0 impact"}
        ).json()
        assert body["artifacts"]
        for a in body["artifacts"]:
            assert len(a["snippet"]) <= 800

    def test_zero_hit_query(self, client):
        client.post("/ingest/transcript", json={
            "call_ref": {"external_id": "zh-1"},
            "transcript": {"format": "json_turns", "content": [
                {"speaker": "A", "start_ts_ms": 0, "end_ts_ms": 900,
                 "text": "completely ordinary sentence"},
            ]},
        })
        body = client.post(
            "/retrieve",
            json={"query": "zzyzx qwertyuiop", "return_style": "ids_only"},
        ).json()
        # no lexical overlap, no tech tokens, stub-dense may still rank:
        # the contract is "no crash, a list comes back"
        assert isinstance(body["retrieved_ids"], list)
