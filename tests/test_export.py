import csv
import json

from yomitoku_tpu.schemas import (
    DocumentAnalyzerSchema,
    FigureSchema,
    ParagraphSchema,
    TableCellSchema,
    TableLineSchema,
    TableStructureRecognizerSchema,
    WordPrediction,
)


def make_doc():
    cells = [
        TableCellSchema(
            col=1, row=1, col_span=1, row_span=1, box=[0, 0, 10, 10], contents="h1"
        ),
        TableCellSchema(
            col=2, row=1, col_span=1, row_span=1, box=[10, 0, 20, 10], contents="h2"
        ),
        TableCellSchema(
            col=1, row=2, col_span=2, row_span=1, box=[0, 10, 20, 20],
            contents="wide\ncell",
        ),
    ]
    table = TableStructureRecognizerSchema(
        box=[0, 0, 20, 20],
        n_row=2,
        n_col=2,
        rows=[TableLineSchema(box=[0, 0, 20, 10], score=0.9)],
        cols=[TableLineSchema(box=[0, 0, 10, 20], score=0.9)],
        spans=[],
        cells=cells,
        order=1,
    )
    para = ParagraphSchema(
        box=[0, 30, 50, 40],
        contents="hello *world*",
        direction="horizontal",
        order=0,
        role=None,
    )
    heading = ParagraphSchema(
        box=[0, 50, 50, 60],
        contents="Heading",
        direction="horizontal",
        order=2,
        role="section_headings",
    )
    word = WordPrediction(
        points=[[0, 30], [50, 30], [50, 40], [0, 40]],
        content="hello",
        direction="horizontal",
        rec_score=0.99,
        det_score=0.98,
    )
    return DocumentAnalyzerSchema(
        paragraphs=[para, heading], tables=[table], words=[word], figures=[]
    )


def test_export_markdown(tmp_path):
    doc = make_doc()
    out = tmp_path / "doc.md"
    md = doc.to_markdown(str(out))
    text = out.read_text()
    assert md == text
    assert "hello \\*world\\*" in text
    assert "# Heading" in text
    assert "|h1|h2|" in text
    assert "|-|-|" in text
    assert "wide<br>cell" in text


def test_export_markdown_ignore_line_break(tmp_path):
    doc = make_doc()
    md = doc.to_markdown(str(tmp_path / "doc.md"), ignore_line_break=True)
    assert "widecell" in md


def test_export_html(tmp_path):
    doc = make_doc()
    out = tmp_path / "doc.html"
    html = doc.to_html(str(out), export_figure=False)
    assert '<table border="1"' in html
    assert '<td rowspan="1" colspan="2">wide<br/>cell</td>' in html
    assert "<h1>Heading</h1>" in html
    assert "<p>hello *world*</p>" in html


def test_export_csv(tmp_path):
    doc = make_doc()
    out = tmp_path / "doc.csv"
    doc.to_csv(str(out), export_figure=False)
    with open(out, newline="") as f:
        rows = list(csv.reader(f))
    # paragraph order 0 first, then table order 1, then heading order 2
    assert rows[0] == ["hello *world*"]
    assert rows[1] == [""]
    assert rows[2] == ["h1", "h2"]
    assert rows[3] == ["wide\ncell", ""]


def test_export_json(tmp_path):
    doc = make_doc()
    out = tmp_path / "doc.json"
    doc.to_json(str(out))
    data = json.loads(out.read_text())
    assert data["paragraphs"][0]["contents"] == "hello *world*"
    assert data["tables"][0]["n_row"] == 2
    assert len(data["words"]) == 1


def test_export_json_ignore_line_break(tmp_path):
    doc = make_doc()
    out = tmp_path / "doc.json"
    doc.to_json(str(out), ignore_line_break=True)
    data = json.loads(out.read_text())
    assert data["tables"][0]["cells"][2]["contents"] == "widecell"


def test_figure_export(tmp_path):
    import numpy as np

    doc = make_doc()
    doc.figures.append(
        FigureSchema(
            box=[0, 0, 10, 10], order=3, paragraphs=[], direction="horizontal"
        )
    )
    img = np.zeros((50, 50, 3), dtype=np.uint8)
    out = tmp_path / "doc.md"
    md = doc.to_markdown(str(out), img=img, export_figure=True)
    assert (tmp_path / "figures" / "doc_figure_0.png").exists()
    assert '<img src="figures/doc_figure_0.png"' in md


def test_schema_extra_forbid():
    import pytest
    from pydantic import ValidationError

    with pytest.raises(ValidationError):
        ParagraphSchema(
            box=[0, 0, 1, 1],
            contents="x",
            direction=None,
            order=None,
            role=None,
            bogus=1,
        )
