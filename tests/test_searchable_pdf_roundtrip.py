"""Roundtrip: write a searchable PDF with the built-in writer, re-open it
with the built-in PDF parser, and verify structure + the invisible text
layer (render-mode-3 operators and the word glyphs via ToUnicode)."""

import numpy as np

from yomitoku_tpu.data.pdf.document import PdfDocument
from yomitoku_tpu.schemas import (
    DocumentAnalyzerSchema,
    ParagraphSchema,
    WordPrediction,
)
from yomitoku_tpu.utils.searchable_pdf import create_searchable_pdf


def _doc():
    word = WordPrediction(
        points=[[20, 20], [220, 20], [220, 60], [20, 60]],
        content="テスト text",
        direction="horizontal",
        det_score=0.99,
        rec_score=0.98,
    )
    para = ParagraphSchema(
        box=[20, 20, 220, 60], contents="テスト text",
        direction="horizontal", order=0, role=None,
    )
    return DocumentAnalyzerSchema(
        paragraphs=[para], tables=[], figures=[], words=[word]
    )


def test_searchable_pdf_roundtrip(tmp_path):
    img = np.full((200, 300, 3), 255, np.uint8)
    out = tmp_path / "out.pdf"
    create_searchable_pdf([img], [_doc()], output_path=str(out))

    raw = out.read_bytes()
    assert raw.startswith(b"%PDF")

    doc = PdfDocument(str(out))
    assert doc.n_pages == 1
    content = doc.get_page_content(doc.get_page(0))
    assert b"3 Tr" in content  # invisible text render mode
    assert b"Tj" in content or b"TJ" in content  # text-showing operator
    # ToUnicode CMap must be embedded for copy/paste extraction
    assert b"ToUnicode" in raw


def test_searchable_pdf_renders_back(tmp_path):
    """The built-in renderer must be able to rasterize its own output."""
    from yomitoku_tpu.data.pdf import load_pdf

    img = np.full((100, 150, 3), 240, np.uint8)
    img[30:60, 40:100] = 30  # dark box to check round-trip visually
    out = tmp_path / "rt.pdf"
    create_searchable_pdf([img], [_doc()], output_path=str(out))
    pages = list(load_pdf(str(out), dpi=72))
    assert len(pages) == 1
    page = pages[0]
    assert page.ndim == 3 and page.shape[2] == 3
    # dark region survives the JPEG+render pipeline
    assert page[page.shape[0] // 2, page.shape[1] // 2].mean() < 128
