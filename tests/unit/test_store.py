"""Store-layer tests: migrations, version gate, queue claim semantics."""

import time

import pytest

from cadence_rag_tpu.store.db import SCHEMA_VERSION, Store, get_store


class TestMigrations:
    def test_fresh_store_fully_migrated(self, tmp_path):
        store = Store(str(tmp_path / "fresh.db"))
        info = store.fetch_info()
        assert info["schema_version"] == SCHEMA_VERSION
        store.close()

    def test_migrations_idempotent(self, tmp_path):
        path = str(tmp_path / "twice.db")
        Store(path).close()
        store = Store(path)  # re-open re-runs _migrate, must be a no-op
        ok, msg = store.validate_versions()
        assert ok, msg
        store.close()

    def test_version_gate_reports_backend(self, tmp_store):
        ok, message = get_store().validate_versions()
        assert ok
        assert "schema" in message and "device" in message

    def test_constraints_exist(self, tmp_path):
        store = Store(str(tmp_path / "c.db"))
        with store.tx() as conn:
            conn.execute(
                "INSERT INTO calls (call_id, call_seq, started_at, "
                "external_id) VALUES ('a', 0, '2026-01-01T00:00:00+00:00', 'x')"
            )
        with pytest.raises(Exception):
            with store.tx() as conn:
                conn.execute(
                    "INSERT INTO calls (call_id, call_seq, started_at, "
                    "external_id) VALUES ('b', 1, '2026-01-01T00:00:00+00:00', 'x')"
                )
        with pytest.raises(Exception):
            with store.tx() as conn:
                conn.execute(
                    "INSERT INTO ingest_jobs (ingest_job_id, bundle_id, "
                    "status, max_attempts) VALUES ('j', 'b', 'bogus', 3)"
                )
        store.close()


class TestQueueClaims:
    def test_claim_ack_visibility(self, tmp_store):
        from cadence_rag_tpu.ingest.fs_queue import ack, claim_next, enqueue_job

        enqueue_job("job-1")
        msg = claim_next("w1")
        assert msg["job_id"] == "job-1"
        # claimed: not visible to another worker inside the window
        assert claim_next("w2") is None
        # stale claim becomes visible again
        store = get_store()
        with store.tx() as conn:
            conn.execute("UPDATE queue SET claimed_at = ?", (time.time() - 10_000,))
        msg2 = claim_next("w2", visibility_s=600)
        assert msg2 is not None and msg2["job_id"] == "job-1"
        ack(msg2["message_id"])
        assert claim_next("w3") is None

    def test_delayed_availability(self, tmp_store):
        from cadence_rag_tpu.ingest.fs_queue import claim_next, enqueue_job

        enqueue_job("job-later", delay_s=3600)
        assert claim_next("w1") is None
