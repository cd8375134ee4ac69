"""Exporter edge cases pinned to the reference's exact output strings
(reference tests/test_export.py) — escaping rules, span holes, line-break
handling, in-place JSON strip semantics, and per-schema to_json roundtrips.
"""

import json

import numpy as np
import pytest

from yomitoku_tpu.export.export_csv import paragraph_to_csv, table_to_csv
from yomitoku_tpu.export.export_html import (
    convert_text_to_html,
    paragraph_to_html,
    table_to_html,
)
from yomitoku_tpu.export.export_json import convert_json
from yomitoku_tpu.export.export_markdown import (
    escape_markdown_special_chars,
    paragraph_to_md,
    table_to_md,
)
from yomitoku_tpu.schemas import (
    DocumentAnalyzerSchema,
    Element,
    FigureSchema,
    LayoutAnalyzerSchema,
    LayoutParserSchema,
    OCRSchema,
    ParagraphSchema,
    TableCellSchema,
    TableLineSchema,
    TableStructureRecognizerSchema,
    WordPrediction,
)


def _table_with_rowspan(cell3_contents="dummy\n"):
    """2x2 table: (1,1) spans two rows, (2,1) is the span hole."""
    cells = [
        TableCellSchema(
            box=[0, 0, 10, 10], row=1, col=1, row_span=2, col_span=1,
            contents="dummy\n",
        ),
        TableCellSchema(
            box=[0, 0, 10, 10], row=1, col=2, row_span=1, col_span=1,
            contents="dummy\n",
        ),
        TableCellSchema(
            box=[0, 0, 10, 10], row=2, col=2, row_span=1, col_span=1,
            contents=cell3_contents,
        ),
    ]
    line = TableLineSchema(box=[0, 0, 10, 10], score=0.9)
    return TableStructureRecognizerSchema(
        box=[0, 0, 100, 100], n_row=2, n_col=2, cells=cells, order=0,
        rows=[line], cols=[line], spans=[line],
    )


def _paragraph(contents, role=None):
    return ParagraphSchema(
        direction="horizontal", box=[0, 0, 10, 10], contents=contents,
        order=0, role=role,
    )


# ------------------------------------------------------------------ html

def test_convert_text_to_html_escaping():
    assert (
        convert_text_to_html("これはテストです。<p>がんばりましょう。</p>")
        == "これはテストです。&lt;p&gt;がんばりましょう。&lt;/p&gt;"
    )
    # URLs stay as plain (escaped) text, not links
    assert (
        convert_text_to_html("これはテストです。https://www.google.com")
        == "これはテストです。https://www.google.com"
    )
    assert (
        convert_text_to_html(
            "これはテストです。<a href='https://www.google.com'>Google</a>"
        )
        == "これはテストです。&lt;a href=&#x27;https://www.google.com&#x27;&gt;"
        "Google&lt;/a&gt;"
    )


def test_table_to_html_rowspan_and_line_breaks():
    table = _table_with_rowspan(cell3_contents="")
    expected = (
        '<table border="1" style="border-collapse: collapse">'
        '<tr><td rowspan="2" colspan="1">dummy<br></td>'
        '<td rowspan="1" colspan="1">dummy<br></td></tr>'
        '<tr><td rowspan="1" colspan="1"></td></tr></table>'
    )
    assert table_to_html(table, ignore_line_break=False)["html"] == expected
    expected_nb = expected.replace("<br>", "")
    assert table_to_html(table, ignore_line_break=True)["html"] == expected_nb


def test_paragraph_to_html_escapes_and_breaks():
    p = _paragraph("これはテストです。<a href='https://www.google.com'>Google</a>\n")
    expected = (
        "<p>これはテストです。&lt;a href=&#x27;https://www.google.com&#x27;&gt;"
        "Google&lt;/a&gt;<br></p>"
    )
    assert paragraph_to_html(p, ignore_line_break=False)["html"] == expected
    assert (
        paragraph_to_html(p, ignore_line_break=True)["html"]
        == expected.replace("<br>", "")
    )


def test_paragraph_to_html_section_heading():
    p = _paragraph("見出し\n", role="section_headings")
    assert paragraph_to_html(p, True)["html"] == "<p><h1>見出し</h1></p>"


# -------------------------------------------------------------- markdown

@pytest.mark.parametrize(
    "text,expected",
    [
        ("![image](https://www.google.com)", r"\!\[image\]\(https://www.google.com\)"),
        ("**これはテストです**", r"\*\*これはテストです\*\*"),
        ("- これはテストです", r"\- これはテストです"),
        ("1. これはテストです", "1. これはテストです"),  # numbers NOT escaped
        ("| これはテストです", r"\| これはテストです"),
        (
            "```python\nprint('Hello, World!')\n```",
            "\\`\\`\\`python\nprint\\('Hello, World\\!'\\)\n\\`\\`\\`",
        ),
    ],
)
def test_escape_markdown_special_chars(text, expected):
    assert escape_markdown_special_chars(text) == expected


def test_paragraph_to_md_escape_and_breaks():
    p = _paragraph("print('Hello, World!')\n")
    assert (
        paragraph_to_md(p, ignore_line_break=False)["md"]
        == "print\\('Hello, World\\!'\\)<br>\n"
    )
    assert (
        paragraph_to_md(p, ignore_line_break=True)["md"]
        == "print\\('Hello, World\\!'\\)\n"
    )


def test_paragraph_to_md_section_heading():
    p = _paragraph("見出し\n", role="section_headings")
    assert paragraph_to_md(p, True)["md"] == "# 見出し\n"


def test_table_to_md_pipe_grid_with_span_hole():
    table = _table_with_rowspan()
    assert (
        table_to_md(table, ignore_line_break=False)["md"]
        == "|dummy<br>|dummy<br>|\n|-|-|\n||dummy<br>|\n"
    )
    assert (
        table_to_md(table, ignore_line_break=True)["md"]
        == "|dummy|dummy|\n|-|-|\n||dummy|\n"
    )


def test_table_to_md_escapes_cell_pipes():
    table = _table_with_rowspan(cell3_contents="a|b\n")
    md = table_to_md(table, ignore_line_break=True)["md"]
    assert "a\\|b" in md  # unescaped pipes would break the grid


# ------------------------------------------------------------------- csv

def test_table_to_csv_grid_with_span_hole():
    table = _table_with_rowspan()
    assert table_to_csv(table, ignore_line_break=False) == [
        ["dummy\n", "dummy\n"],
        ["", "dummy\n"],
    ]
    assert table_to_csv(table, ignore_line_break=True) == [
        ["dummy", "dummy"],
        ["", "dummy"],
    ]


def test_paragraph_to_csv_line_breaks():
    p = _paragraph("dummy\n")
    assert paragraph_to_csv(p, ignore_line_break=False) == "dummy\n"
    assert paragraph_to_csv(p, ignore_line_break=True) == "dummy"


# ------------------------------------------------------------------ json

def test_convert_json_strips_in_place():
    """ignore_line_break mutates the schema in place (reference
    export_json semantics: paragraph.contents loses its trailing \\n)."""
    doc = DocumentAnalyzerSchema(
        paragraphs=[_paragraph("dummy\n")],
        tables=[_table_with_rowspan()],
        words=[],
        figures=[],
    )
    convert_json(doc, out_path=None, ignore_line_break=False)
    assert doc.paragraphs[0].contents == "dummy\n"
    convert_json(doc, out_path=None, ignore_line_break=True)
    assert doc.paragraphs[0].contents == "dummy"
    assert all(c.contents == "dummy" for c in doc.tables[0].cells)


def _word():
    return WordPrediction(
        points=[[0, 0], [10, 0], [10, 10], [0, 10]],
        content="word",
        direction="horizontal",
        det_score=0.9,
        rec_score=0.9,
    )


def test_schema_to_json_roundtrips(tmp_path):
    """Every public schema writes itself to JSON identical to model_dump."""
    element = Element(
        id=None, box=[0, 0, 10, 10], score=0.9, role=None, contents=None
    )
    figure = FigureSchema(
        box=[0, 0, 10, 10], order=0, paragraphs=[_paragraph("fig\n")],
        direction="horizontal",
    )
    cases = {
        "ocr": OCRSchema(words=[_word()]),
        "element": element,
        "layout_parser": LayoutParserSchema(
            paragraphs=[element], tables=[element], figures=[element]
        ),
        "tsr": _table_with_rowspan(),
        "layout_analyzer": LayoutAnalyzerSchema(
            paragraphs=[element], tables=[_table_with_rowspan()],
            figures=[element],
        ),
        "paragraph": _paragraph("dummy\n"),
        "figure": figure,
        "document_analyzer": DocumentAnalyzerSchema(
            paragraphs=[_paragraph("dummy\n")],
            tables=[_table_with_rowspan()],
            words=[_word()],
            figures=[figure],
        ),
    }
    for name, obj in cases.items():
        out = tmp_path / f"{name}.json"
        obj.to_json(out)
        with open(out, encoding="utf-8") as f:
            assert json.load(f) == obj.model_dump(), name


def test_document_all_format_writers(tmp_path):
    img = np.zeros((50, 50, 3), np.uint8)
    doc = DocumentAnalyzerSchema(
        paragraphs=[_paragraph("dummy\n")],
        tables=[_table_with_rowspan()],
        words=[_word()],
        figures=[],
    )
    doc.to_csv(tmp_path / "d.csv", img=img)
    doc.to_html(tmp_path / "d.html", img=img)
    doc.to_markdown(tmp_path / "d.md", img=img)
    for ext in ("csv", "html", "md"):
        assert (tmp_path / f"d.{ext}").exists()
        assert "dummy" in (tmp_path / f"d.{ext}").read_text(encoding="utf-8")


def test_csv_save_with_cp932_encoding(tmp_path):
    """errors='ignore': characters unrepresentable in the target encoding
    are dropped, not fatal (reference save_csv semantics)."""
    from yomitoku_tpu.export.export_csv import export_csv

    doc = DocumentAnalyzerSchema(
        paragraphs=[_paragraph("テスト\u2603\n")],  # snowman not in cp932
        tables=[],
        words=[],
        figures=[],
    )
    out = tmp_path / "d.csv"
    export_csv(doc, out, encoding="cp932", img=None, export_figure=False)
    text = out.read_text(encoding="cp932")
    assert "テスト" in text and "\u2603" not in text
