"""CLI entry-point smoke tests (reference: app/scripts/* are operator
surfaces; each must run end-to-end in --once / one-shot modes)."""

import json
import sys
from pathlib import Path

import pytest

from cadence_rag_tpu.ingest.ingest import ingest_transcript
from cadence_rag_tpu.schemas import CallRef, ChunkingOptions, UtteranceIn


@pytest.fixture()
def ingest_env(tmp_store, tmp_path, monkeypatch):
    root = tmp_path / "ingest"
    (root / "inbox").mkdir(parents=True)
    monkeypatch.setattr(tmp_store, "ingest_root_dir", str(root))
    monkeypatch.setattr(tmp_store, "ingest_single_file_min_age_s", 0)
    return root


def _drop_bundle(root: Path):
    bundle = root / "inbox" / "cli-bundle"
    bundle.mkdir()
    (bundle / "transcript.json").write_text(json.dumps(
        [{"speaker": "A", "start_ts_ms": 0, "end_ts_ms": 900,
          "text": "cli smoke test about ECONNRESET"}]
    ))
    (bundle / "_READY").touch()


class TestCliScripts:
    def test_scanner_once(self, ingest_env, monkeypatch):
        from cadence_rag_tpu.scripts.ingest_scanner import main

        _drop_bundle(ingest_env)
        monkeypatch.setattr(sys, "argv", ["ingest_scanner", "--once"])
        main()
        from cadence_rag_tpu.ingest.fs_queue import list_ingest_jobs

        assert list_ingest_jobs()["items"][0]["status"] == "queued"

    def test_worker_once(self, ingest_env, monkeypatch):
        """Worker default = store-only (its own device index dies with
        the process); a serving process's syncer applies the device
        work — asserted here via poll_once."""
        from cadence_rag_tpu.scripts.ingest_scanner import main as scan_main
        from cadence_rag_tpu.scripts.ingest_worker import main as work_main

        _drop_bundle(ingest_env)
        monkeypatch.setattr(sys, "argv", ["ingest_scanner", "--once"])
        scan_main()
        monkeypatch.setattr(sys, "argv", ["ingest_worker", "--once"])
        work_main()
        from cadence_rag_tpu.ingest.fs_queue import list_ingest_jobs

        assert list_ingest_jobs()["items"][0]["status"] == "succeeded"
        from cadence_rag_tpu.core.index import get_index
        from cadence_rag_tpu.ingest.ingest import set_store_only
        from cadence_rag_tpu.ingest.sync import get_syncer

        assert get_index().chunks.count == 0  # worker wrote store only
        set_store_only(False)  # back to "serving process" semantics
        assert get_syncer().poll_once()["inserted"] >= 1
        assert get_index().chunks.count >= 1

    def test_embed_backfill_cli(self, tmp_store, monkeypatch):
        ingest_transcript(
            CallRef(external_id="cli-embed"),
            [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                         text="text to embed")],
            ChunkingOptions(target_tokens=5, max_tokens=20, overlap_tokens=0),
        )
        from cadence_rag_tpu.scripts.embed_backfill import main

        monkeypatch.setattr(sys, "argv", ["embed_backfill", "--batch-size", "4"])
        main()
        # CLI default = store-only: vectors land in the store + log ...
        from cadence_rag_tpu.core.index import get_index
        from cadence_rag_tpu.ingest.ingest import set_store_only
        from cadence_rag_tpu.ingest.sync import get_syncer

        assert not get_index().chunks.h_has_emb[:1].any()
        # ... and a serving process's syncer scatters them
        set_store_only(False)
        get_syncer().poll_once()
        assert get_index().chunks.h_has_emb[:1].all()

    def test_tech_backfill_cli_dry_run(self, tmp_store, monkeypatch):
        ingest_transcript(
            CallRef(external_id="cli-tech"),
            [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                         text="mentions lenovo and SSD")],
            ChunkingOptions(target_tokens=5, max_tokens=20, overlap_tokens=0),
        )
        from cadence_rag_tpu.scripts.tech_tokens_backfill import main

        monkeypatch.setattr(sys, "argv", ["tech_tokens_backfill", "--dry-run"])
        main()  # tokens unchanged -> no updates; must complete cleanly

    def test_snapshot_cli_roundtrip(self, tmp_store, tmp_path, monkeypatch):
        ingest_transcript(
            CallRef(external_id="cli-snap"),
            [UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=900,
                         text="snapshot me")],
            ChunkingOptions(target_tokens=5, max_tokens=20, overlap_tokens=0),
        )
        from cadence_rag_tpu.core.index import get_index, reset_index
        from cadence_rag_tpu.scripts.index_snapshot import main

        snap = str(tmp_path / "snap")
        monkeypatch.setattr(sys, "argv", ["index_snapshot", "save", snap])
        main()
        count = get_index().chunks.count
        reset_index()
        monkeypatch.setattr(sys, "argv", ["index_snapshot", "restore", snap])
        main()
        assert get_index().chunks.count == count
