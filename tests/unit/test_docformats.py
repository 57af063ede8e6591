"""Vendored docx/pdf extraction (stdlib-only; reference extracts these via
python-docx / pypdf, app/ingest_adapters.py:131-182 — neither library is
in this image, so the fallback extractors must carry adapter parity)."""

import zipfile
import zlib

import pytest

from cadence_rag_tpu.ingest.adapters import AdapterError, load_analysis_content
from cadence_rag_tpu.ingest.docformats import (
    ExtractionError,
    docx_to_text,
    pdf_to_text,
)

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def make_docx(path, paragraphs, table_rows=()):
    body = []
    for p in paragraphs:
        body.append(f'<w:p><w:r><w:t>{p}</w:t></w:r></w:p>')
    if table_rows:
        cells = "".join(
            "<w:tr>" + "".join(
                f"<w:tc><w:p><w:r><w:t>{c}</w:t></w:r></w:p></w:tc>"
                for c in row
            ) + "</w:tr>"
            for row in table_rows
        )
        body.append(f"<w:tbl>{cells}</w:tbl>")
    document = (
        f'<?xml version="1.0"?><w:document xmlns:w="{W}">'
        f'<w:body>{"".join(body)}</w:body></w:document>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxml'
            'formats.org/package/2006/content-types"/>',
        )
        zf.writestr("word/document.xml", document)
    return path


def make_pdf(path, page_contents, *, compress=False, tounicode=None,
             objstm_page=False):
    """Assemble a small PDF. ``page_contents`` is a list of content-stream
    byte strings (one page each). ``tounicode`` adds a CID font F2 with the
    given CMap stream bytes. ``objstm_page`` stores page dicts inside a
    compressed /ObjStm (the modern-PDF layout)."""
    objects = {}
    n_pages = len(page_contents)
    kid_refs = " ".join(f"{10 + i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kid_refs}] /Count {n_pages} >>".encode()
    )
    font_res = b"/F1 5 0 R"
    objects[5] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    if tounicode is not None:
        font_res += b" /F2 6 0 R"
        objects[6] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
            b"/ToUnicode 7 0 R >>"
        )
        objects[7] = (b"<< /Length %d >>\nstream\n" % len(tounicode)
                      + tounicode + b"\nendstream")
    page_dicts = {}
    for i, content in enumerate(page_contents):
        raw = content
        filt = b""
        if compress:
            raw = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        objects[20 + i] = (b"<< /Length %d%s >>\nstream\n" % (len(raw), filt)
                           + raw + b"\nendstream")
        page_dicts[10 + i] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R "
            b"/Resources << /Font << %s >> >> >>" % (20 + i, font_res)
        )
    if objstm_page:
        # pack the page dicts into a Flate-compressed object stream
        header, body = [], []
        offset = 0
        for num, dic in page_dicts.items():
            header.append(b"%d %d" % (num, offset))
            body.append(dic)
            offset += len(dic) + 1
        head = b" ".join(header) + b" "
        stm = head + b" ".join(body)
        packed = zlib.compress(stm)
        objects[30] = (
            b"<< /Type /ObjStm /N %d /First %d /Length %d "
            b"/Filter /FlateDecode >>\nstream\n"
            % (len(page_dicts), len(head), len(packed))
            + packed + b"\nendstream"
        )
    else:
        objects.update(page_dicts)
    out = [b"%PDF-1.5"]
    for num in sorted(objects):
        out.append(b"%d 0 obj\n" % num + objects[num] + b"\nendobj")
    out.append(b"trailer << /Root 1 0 R >>\n%%EOF")
    path.write_bytes(b"\n".join(out))
    return path


class TestDocx:
    def test_paragraphs_and_tables(self, tmp_path):
        p = make_docx(
            tmp_path / "notes.docx",
            ["Incident summary", "ECONNRESET storm traced to the gateway"],
            table_rows=[["Action", "Owner"], ["pin v2.3.1", "Raj"]],
        )
        text = docx_to_text(p)
        assert "Incident summary" in text
        assert "ECONNRESET storm traced to the gateway" in text
        assert "pin v2.3.1" in text  # table cell paragraphs included

    def test_not_a_docx(self, tmp_path):
        bad = tmp_path / "x.docx"
        bad.write_bytes(b"garbage")
        with pytest.raises(ExtractionError):
            docx_to_text(bad)

    def test_adapter_dispatch(self, tmp_path):
        p = make_docx(tmp_path / "a.docx", ["Postmortem notes body"])
        assert "Postmortem notes body" in load_analysis_content(p, "auto")


class TestPdf:
    def test_simple_literal_text(self, tmp_path):
        p = make_pdf(tmp_path / "a.pdf", [
            b"BT /F1 12 Tf 72 720 Td (Hello ECONNRESET world) Tj ET",
        ])
        assert pdf_to_text(p) == "Hello ECONNRESET world"

    def test_multipage_flate_tj_array(self, tmp_path):
        p = make_pdf(tmp_path / "b.pdf", [
            b"BT /F1 12 Tf 72 720 Td [(Latency) -300 (budget)] TJ ET",
            b"BT /F1 12 Tf 72 720 Td (Second page) Tj 0 -14 Td "
            b"(next line) Tj ET",
        ], compress=True)
        text = pdf_to_text(p)
        assert "Latency budget" in text          # kern -> word gap
        assert "Second page" in text
        assert "next line" in text
        assert text.index("Latency") < text.index("Second page")
        assert "Second page\nnext line" in text  # Td y-move -> newline

    def test_escapes_and_parens(self, tmp_path):
        p = make_pdf(tmp_path / "c.pdf", [
            rb"BT /F1 9 Tf (line one\nwith \(parens\) and \134slash) Tj ET",
        ])
        text = pdf_to_text(p)
        assert "with (parens) and \\slash" in text

    def test_cid_font_tounicode_hex_strings(self, tmp_path):
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"begincmap\n"
            b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            b"2 beginbfchar\n<0001> <0048>\n<0002> <0065>\nendbfchar\n"
            b"1 beginbfrange\n<0010> <0012> <006C>\nendbfrange\n"
            b"endcmap"
        )
        p = make_pdf(tmp_path / "d.pdf", [
            b"BT /F2 12 Tf <00010002001000110012> Tj ET",
        ], tounicode=cmap)
        # 0001->H 0002->e 0010->l 0011->m 0012->n
        assert pdf_to_text(p) == "Helmn"

    def test_object_stream_layout(self, tmp_path):
        p = make_pdf(tmp_path / "e.pdf", [
            b"BT /F1 12 Tf (packed in ObjStm) Tj ET",
        ], compress=True, objstm_page=True)
        assert pdf_to_text(p) == "packed in ObjStm"

    def test_not_a_pdf(self, tmp_path):
        bad = tmp_path / "x.pdf"
        bad.write_bytes(b"plain text, no header")
        with pytest.raises(ExtractionError):
            pdf_to_text(bad)

    def test_image_only_pdf_yields_empty(self, tmp_path):
        # no text operators: extractor returns "" so the adapter's OCR
        # quality gate decides (reference parity: _should_run_pdf_ocr)
        p = make_pdf(tmp_path / "scan.pdf", [b"q 100 0 0 100 0 0 cm Q"])
        assert pdf_to_text(p) == ""

    def test_adapter_dispatch(self, tmp_path):
        p = make_pdf(tmp_path / "report.pdf", [
            b"BT /F1 12 Tf (Quarterly capacity report) Tj ET",
        ])
        assert "Quarterly capacity report" in load_analysis_content(p, "auto")

    def test_adapter_error_when_unreadable_and_no_ocr(self, tmp_path):
        bad = tmp_path / "broken.pdf"
        bad.write_bytes(b"not really a pdf")
        with pytest.raises(AdapterError):
            load_analysis_content(bad, "pdf")
