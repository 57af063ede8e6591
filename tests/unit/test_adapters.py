"""Adapter tests (coverage model: reference tests/unit/test_ingest_adapters.py:
strict json_turns + alt-key normalization with sec->ms, csv/json->markdown
table, markdown transcript timestamps, gated docx/pdf dispatch)."""

import json

import pytest

from cadence_rag_tpu.ingest.adapters import (
    AdapterError,
    infer_analysis_format,
    load_analysis_content,
    load_transcript_payload,
)


class TestTranscriptAdapters:
    def test_strict_json_turns(self, tmp_path):
        path = tmp_path / "t.json"
        path.write_text(
            json.dumps(
                [
                    {"speaker": "A", "start_ts_ms": 0, "end_ts_ms": 100, "text": "hi"},
                    {"speaker": "B", "start_ts_ms": 100, "end_ts_ms": 200, "text": "yo"},
                ]
            )
        )
        utts = load_transcript_payload(path, "json_turns")
        assert [u.speaker for u in utts] == ["A", "B"]
        assert utts[1].start_ts_ms == 100

    def test_strict_rejects_bad_turn(self, tmp_path):
        path = tmp_path / "t.json"
        path.write_text(json.dumps([{"speaker": "A", "text": "missing ts"}]))
        with pytest.raises(AdapterError):
            load_transcript_payload(path, "json_turns")

    def test_auto_alt_keys_and_seconds(self, tmp_path):
        path = tmp_path / "alt.json"
        path.write_text(
            json.dumps(
                {
                    "segments": [
                        {"name": "Ana", "begin": 1.5, "end": 3.0,
                         "content": "hello there"},
                        {"name": "Raj", "begin": 3, "end": 5,
                         "content": "hi back"},
                    ]
                }
            )
        )
        utts = load_transcript_payload(path, "auto")
        assert utts[0].speaker == "Ana"
        assert utts[0].start_ts_ms == 1500  # fractional seconds -> ms
        assert utts[1].start_ts_ms == 3000  # small ints are seconds
        assert utts[1].end_ts_ms == 5000

    def test_auto_large_values_kept_as_ms(self, tmp_path):
        path = tmp_path / "ms.json"
        path.write_text(
            json.dumps([{"text": "x", "start_ts_ms": 720000, "end_ts_ms": 725000}])
        )
        utts = load_transcript_payload(path, "auto")
        assert utts[0].start_ts_ms == 720000

    def test_markdown_turns_with_timestamps(self, tmp_path):
        path = tmp_path / "t.md"
        path.write_text(
            "*00:05*\n**Ana**: kicking off the review\n"
            "**Raj**: sounds good\n*01:30*\n**Ana**: moving on\n"
        )
        utts = load_transcript_payload(path, "markdown_turns")
        assert utts[0].start_ts_ms == 5000
        assert utts[1].speaker == "Raj"
        assert utts[2].start_ts_ms == 90000

    def test_markdown_without_turns_raises(self, tmp_path):
        path = tmp_path / "t.md"
        path.write_text("just prose, no speakers\n")
        with pytest.raises(AdapterError):
            load_transcript_payload(path, "markdown_turns")


class TestAnalysisAdapters:
    def test_csv_to_markdown_table(self, tmp_path):
        path = tmp_path / "a.csv"
        path.write_text("item,owner\nBOM review,Ana\nretry fix,Raj\n")
        content = load_analysis_content(path, "csv")
        assert content.startswith("| item | owner |")
        assert "| BOM review | Ana |" in content

    def test_json_records_to_table(self, tmp_path):
        path = tmp_path / "a.json"
        path.write_text(json.dumps([{"k": "v1", "x": 1}, {"k": "v2"}]))
        content = load_analysis_content(path, "json")
        assert content.splitlines()[0] == "| k | x |"

    def test_html_strip(self, tmp_path):
        path = tmp_path / "a.html"
        path.write_text(
            "<html><style>x{}</style><body><p>Hello <b>world</b></p>"
            "<script>bad()</script></body></html>"
        )
        content = load_analysis_content(path, "html")
        assert "Hello world" in content
        assert "bad()" not in content

    def test_format_inference(self, tmp_path):
        assert infer_analysis_format(tmp_path / "x.csv") == "csv"
        assert infer_analysis_format(tmp_path / "x.PDF") == "pdf"
        assert infer_analysis_format(tmp_path / "x.unknown") == "text"

    def test_docx_unreadable_raises(self, tmp_path):
        # python-docx is absent; the vendored extractor serves the format
        # and reports unreadable archives as AdapterError
        path = tmp_path / "a.docx"
        path.write_bytes(b"PK\x03\x04 fake")
        with pytest.raises(AdapterError, match="docx"):
            load_analysis_content(path, "docx")

    def test_pdf_no_text_without_ocr(self, tmp_path, tmp_store, monkeypatch):
        # a header-only pdf parses but yields no text; without OCR that is
        # an AdapterError (reference: "pdf produced no text")
        monkeypatch.setattr(tmp_store, "analysis_pdf_ocr_enabled", False)
        path = tmp_path / "a.pdf"
        path.write_bytes(b"%PDF-1.4 fake")
        with pytest.raises(AdapterError, match="no text"):
            load_analysis_content(path, "pdf")

    def test_empty_content_raises(self, tmp_path):
        path = tmp_path / "a.txt"
        path.write_text("   \n  ")
        with pytest.raises(AdapterError, match="no content"):
            load_analysis_content(path, "text")


class TestToMsKeyAware:
    def test_explicit_ms_key_never_rescaled(self):
        """A field NAMED ms is milliseconds (reference _to_milliseconds
        is key-aware): 5000 under start_ms is 5 s, not 5000 s."""
        from cadence_rag_tpu.ingest.adapters import _auto_object

        turns = [{"text": "hello world", "speaker": "A",
                  "start_ms": 5000, "end_ms": 6000}]
        utts = _auto_object({"turns": turns})
        assert utts[0].start_ts_ms == 5000
        assert utts[0].end_ts_ms == 6000

    def test_epoch_seconds_scaled(self):
        from cadence_rag_tpu.ingest.adapters import _to_ms

        assert _to_ms(1_700_000_000, "start") == 1_700_000_000_000
        assert _to_ms(5000, "start") == 5_000_000  # ambiguous: seconds
        assert _to_ms(5000, "start_ms") == 5000
        assert _to_ms(3_600_000, "start") == 3_600_000  # ms duration
