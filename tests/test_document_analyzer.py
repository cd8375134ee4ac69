"""DocumentAnalyzer aggregation helpers (synthetic boxes, mirroring the
reference test strategy, tests/test_document_analyzer.py) + a small
end-to-end run with random weights."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from yomitoku_tpu.document_analyzer import (
    DocumentAnalyzer,
    _split_text_across_cells,
    combine_flags,
    extract_paragraph_within_figure,
    extract_words_within_element,
    judge_page_direction,
    recursive_update,
)
from yomitoku_tpu.schemas import (
    ParagraphSchema,
    TableCellSchema,
    TableLineSchema,
    TableStructureRecognizerSchema,
    TextDetectorSchema,
    WordPrediction,
)


def _para(box, direction="horizontal", role=None, contents="t"):
    return ParagraphSchema(
        box=box, contents=contents, direction=direction, order=0, role=role
    )


def _word(points, content="w", direction="horizontal"):
    return WordPrediction(
        points=points, content=content, direction=direction,
        det_score=0.9, rec_score=0.9,
    )


def test_judge_page_direction():
    paras = [_para([0, 0, 100, 10]), _para([0, 20, 100, 30])]
    assert judge_page_direction(paras) == "horizontal"
    paras = [_para([0, 0, 10, 100], "vertical"), _para([20, 0, 30, 100], "vertical"),
             _para([50, 0, 60, 10])]
    assert judge_page_direction(paras) == "vertical"


def test_combine_flags():
    assert combine_flags([True, False, False], [False, False, True]) == [
        True, False, True,
    ]


def test_recursive_update():
    original = {"a": {"b": 1, "c": 2}, "d": 3}
    out = recursive_update(original, {"a": {"b": 10}, "e": 4})
    assert out == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}


class _Fig:
    def __init__(self, box):
        self.box = box


def test_extract_paragraph_within_figure():
    paras = [_para([10, 10, 50, 20]), _para([200, 200, 250, 210])]
    figures, check = extract_paragraph_within_figure(paras, [_Fig([0, 0, 100, 100])])
    assert check == [True, False]
    assert len(figures) == 1
    assert len(figures[0].paragraphs) == 1
    assert figures[0].direction == "horizontal"


def test_extract_words_within_element_joins_in_reading_order():
    element = _para([0, 0, 200, 100])
    words = [
        _word([[10, 60], [100, 60], [100, 80], [10, 80]], "second"),
        _word([[10, 10], [100, 10], [100, 30], [10, 30]], "first"),
        _word([[500, 500], [600, 500], [600, 520], [500, 520]], "outside"),
    ]
    text, direction, flags = extract_words_within_element(words, element)
    assert text == "first\nsecond"
    assert direction == "horizontal"
    assert flags == [True, True, False]


def test_extract_words_within_element_none_when_empty():
    element = _para([0, 0, 10, 10])
    words = [_word([[500, 500], [600, 500], [600, 520], [500, 520]])]
    text, direction, flags = extract_words_within_element(words, element)
    assert text is None and direction is None and flags == [False]


def _table(box, rows, cols, cells):
    return TableStructureRecognizerSchema(
        box=box,
        n_row=len(rows),
        n_col=len(cols),
        rows=[TableLineSchema(box=b, score=0.9) for b in rows],
        cols=[TableLineSchema(box=b, score=0.9) for b in cols],
        spans=[],
        cells=[TableCellSchema(**c) for c in cells],
        order=0,
    )


class _LayoutRes:
    def __init__(self, tables):
        self.tables = tables


def test_split_text_across_cells():
    # one table, two rows; a horizontal word spans both rows -> split
    table = _table(
        [0, 0, 200, 100],
        rows=[[0, 0, 200, 50], [0, 50, 200, 100]],
        cols=[[0, 0, 200, 100]],
        cells=[
            dict(col=1, row=1, col_span=1, row_span=1, box=[0, 0, 200, 50], contents=None),
            dict(col=1, row=2, col_span=1, row_span=1, box=[0, 50, 200, 100], contents=None),
        ],
    )
    det = TextDetectorSchema(
        points=[
            [[10, 10], [190, 10], [190, 40], [10, 40]],   # inside row 1
            [[300, 300], [400, 300], [400, 330], [300, 330]],  # outside
        ],
        scores=[0.9, 0.8],
    )
    out = _split_text_across_cells(det, _LayoutRes([table]))
    assert len(out.points) == 2  # row-1 word kept (clipped), outside kept
    assert out.scores == [0.9, 0.8]


@pytest.fixture(scope="module")
def analyzer():
    return DocumentAnalyzer(
        configs={
            "ocr": {
                "text_detector": {
                    "path_cfg": "tests/yaml/det_small.yaml",
                    "from_pretrained": False,
                },
                "text_recognizer": {
                    "path_cfg": "tests/yaml/rec_small.yaml",
                    "from_pretrained": False,
                },
            },
            "layout_analyzer": {
                "layout_parser": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
                "table_structure_recognizer": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
            },
        },
        device="cpu",
    )


def test_document_analyzer_config_plumbing(analyzer):
    assert analyzer.text_detector._cfg.data.shortest_size == 64
    assert analyzer.text_recognizer._cfg.encoder.embed_dim == 32
    assert analyzer.layout.layout_parser._cfg.data.img_size == [128, 128]


def test_document_analyzer_end_to_end_small(analyzer):
    img = (np.random.RandomState(0).rand(160, 240, 3) * 255).astype(np.uint8)
    results, ocr, layout = analyzer(img)
    # schema structure (random weights -> content is arbitrary)
    assert hasattr(results, "paragraphs")
    assert hasattr(results, "tables")
    assert hasattr(results, "figures")
    assert hasattr(results, "words")
    orders = [p.order for p in results.paragraphs]
    assert orders == sorted(orders)
    from yomitoku_tpu.export.export_markdown import convert_markdown

    md, _ = convert_markdown(results, out_path=None, img=img, export_figure=False)
    assert isinstance(md, str)


def test_edge_input_shapes(analyzer, monkeypatch):
    """Degenerate page shapes must flow through the full accelerator-path
    pipeline (device crops forced) without raising: tiny pages, 1x1, and
    extreme aspect ratios exercise the /32 det buckets, padding, and the
    separable crop programs at their boundaries."""
    import yomitoku_tpu.ops.device_crop as dc

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)
    rng = np.random.RandomState(0)
    for img in (
        rng.randint(0, 255, (8, 8, 3), np.uint8),
        np.zeros((1, 1, 3), np.uint8),
        rng.randint(0, 255, (4, 300, 3), np.uint8),
    ):
        results, _, _ = analyzer(img)
        assert hasattr(results, "words")
