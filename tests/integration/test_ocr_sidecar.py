"""OCR fallback exercised END TO END through the real subprocess path.

The ocrmypdf binary is absent in this image, so prior coverage mocked
`_pdf_via_ocr` — the subprocess plumbing, CLI contract, and quality
arbitration had never executed (r2 missing #3). These tests install a
FAKE ocrmypdf executable honoring the adapter's CLI contract
(`ocrmypdf --sidecar <txt> --force-ocr -l <langs> <input> <pdf>`,
recognized text written to the sidecar file — reference contract:
ingest_adapters.py:224-273; sidecar and output CANNOT both be stdout
on a real install) and
drive the real `subprocess.run` path, the quality gate, and a full
drop-folder ingest of a scanned (text-less) PDF.
"""

import json
import os
import stat
import sys
from pathlib import Path

import pytest

from tests.unit.test_docformats import make_pdf

OCR_TEXT = (
    "Recovered scanned text: quarterly capacity review for the kafka "
    "cluster. ECONNRESET rollback approved in v2.3.1."
)


@pytest.fixture()
def fake_ocrmypdf(tmp_path, tmp_store, monkeypatch):
    """A real executable that emulates ocrmypdf's sidecar mode and logs
    its argv for assertions."""
    log = tmp_path / "ocr_calls.jsonl"
    exe = tmp_path / "ocrmypdf"
    exe.write_text(
        "#!" + sys.executable + "\n"
        "import json, sys\n"
        f"open({str(log)!r}, 'a').write(json.dumps(sys.argv[1:]) + '\\n')\n"
        "assert '--sidecar' in sys.argv and '--force-ocr' in sys.argv\n"
        "sidecar = sys.argv[sys.argv.index('--sidecar') + 1]\n"
        # real ocrmypdf REJECTS sidecar-to-stdout combined with
        # pdf-to-stdout (two streams can't share it) — the adapter must
        # pass file paths for both
        "assert sidecar != '-', 'sidecar must be a file path'\n"
        "infile, outfile = sys.argv[-2], sys.argv[-1]\n"
        "assert infile.endswith('.pdf'), infile\n"
        "assert outfile != '-', 'output must be a file path'\n"
        f"open(sidecar, 'w').write({OCR_TEXT!r})\n"
        "open(outfile, 'wb').write(b'%PDF-1.4 fake')\n"
    )
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setattr(tmp_store, "analysis_pdf_ocr_enabled", True)
    monkeypatch.setattr(tmp_store, "analysis_pdf_ocr_command", str(exe))
    return log


def _scanned_pdf(path: Path) -> Path:
    # a valid PDF whose page carries no extractable text (image-only
    # scan analogue): the extractor yields "" and the OCR gate fires
    return make_pdf(path, [b""])


class TestOcrSubprocessPath:
    def test_scanned_pdf_recovers_via_ocr(self, tmp_path, fake_ocrmypdf):
        from cadence_rag_tpu.ingest.adapters import load_analysis_content

        pdf = _scanned_pdf(tmp_path / "scan.pdf")
        text = load_analysis_content(pdf, "pdf")
        assert "Recovered scanned text" in text
        calls = [json.loads(l) for l in
                 fake_ocrmypdf.read_text().splitlines()]
        assert len(calls) == 1
        assert "--sidecar" in calls[0] and "-l" in calls[0]

    def test_good_digital_pdf_skips_ocr(self, tmp_path, fake_ocrmypdf,
                                        tmp_store, monkeypatch):
        from cadence_rag_tpu.ingest.adapters import load_analysis_content

        monkeypatch.setattr(tmp_store, "analysis_pdf_ocr_min_chars", 10)
        body = ("The capacity review concluded the SSD tiering rollout "
                "meets latency goals for the billing cluster workloads.")
        pdf = make_pdf(tmp_path / "digital.pdf", [
            b"BT /F1 12 Tf 72 720 Td (" + body.encode() + b") Tj ET",
        ])
        text = load_analysis_content(pdf, "pdf")
        assert "tiering rollout" in text
        assert not fake_ocrmypdf.exists()  # gate never fired

    def test_arbitration_keeps_better_text(self, tmp_path, fake_ocrmypdf,
                                           tmp_store, monkeypatch):
        """force mode runs OCR even on digital PDFs; arbitration keeps
        whichever extraction looks better (reference quality gate:
        ingest_adapters.py:276-293)."""
        from cadence_rag_tpu.ingest.adapters import load_analysis_content

        monkeypatch.setattr(tmp_store, "analysis_pdf_ocr_force", True)
        long_body = " ".join(
            "the postgres vacuum stalls on the ledger table" for _ in range(20)
        )
        pdf = make_pdf(tmp_path / "digital2.pdf", [
            b"BT /F1 12 Tf 72 720 Td (" + long_body.encode() + b") Tj ET",
        ])
        text = load_analysis_content(pdf, "pdf")
        # digital text is longer and clean -> OCR output loses
        assert "vacuum stalls" in text
        assert "Recovered scanned" not in text
        assert fake_ocrmypdf.exists()  # but OCR genuinely RAN

    def test_ocr_failure_surfaces_as_adapter_error(self, tmp_path,
                                                   tmp_store, monkeypatch):
        from cadence_rag_tpu.ingest.adapters import (
            AdapterError,
            load_analysis_content,
        )

        exe = tmp_path / "ocrmypdf"
        exe.write_text("#!" + sys.executable + "\nimport sys; sys.exit(3)\n")
        exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setattr(tmp_store, "analysis_pdf_ocr_enabled", True)
        monkeypatch.setattr(tmp_store, "analysis_pdf_ocr_command", str(exe))
        pdf = _scanned_pdf(tmp_path / "scan2.pdf")
        with pytest.raises(AdapterError, match="OCR failed"):
            load_analysis_content(pdf, "pdf")


class TestOcrDropFolderE2E:
    def test_scanned_bundle_ingests_and_retrieves(self, tmp_path,
                                                  fake_ocrmypdf, tmp_store,
                                                  monkeypatch):
        """Full topology: a drop-folder bundle whose analysis file is a
        scanned PDF — scanner validates, worker ingests through the real
        OCR subprocess, and the recovered text becomes retrievable."""
        from cadence_rag_tpu.engine.retrieve import retrieve_evidence
        from cadence_rag_tpu.ingest.fs_queue import (
            list_ingest_jobs,
            scan_inbox_once,
            work_once,
        )
        from cadence_rag_tpu.schemas import RetrieveRequest

        root = tmp_path / "ingest"
        (root / "inbox").mkdir(parents=True)
        monkeypatch.setattr(tmp_store, "ingest_root_dir", str(root))
        monkeypatch.setattr(tmp_store, "ingest_single_file_min_age_s", 0)

        bundle = root / "inbox" / "scan-bundle"
        bundle.mkdir()
        (bundle / "transcript.json").write_text(json.dumps([
            {"speaker": "Ana", "start_ts_ms": 0, "end_ts_ms": 900,
             "text": "attaching the scanned capacity review"},
        ]))
        _scanned_pdf(bundle / "review.pdf")
        (bundle / "_READY").touch()

        scan_inbox_once()
        assert work_once("ocr-test-worker") == "succeeded"
        job = list_ingest_jobs()["items"][0]
        assert job["status"] == "succeeded"

        ids = retrieve_evidence(RetrieveRequest(
            query="ECONNRESET rollback v2.3.1 capacity review",
            return_style="ids_only",
        ))["retrieved_ids"]
        assert any(i.startswith("artifact_chunk:") for i in ids), ids
