"""End-to-end pipeline structure test: the real DocumentAnalyzer (all
host stages: contours, crops, tokenizer, aggregation, reading order)
driven on the bench's synthetic workload with pinned detector/layout
contents — asserts the structural invariants that random weights can't
change.  Mirrors what bench.py measures, as a regression guard."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow

import bench  # noqa: E402  (repo root on sys.path via conftest)
from yomitoku_tpu.document_analyzer import DocumentAnalyzer  # noqa: E402


@pytest.fixture(scope="module")
def analyzed():
    img, quads, paragraphs, tables, figure_box = bench._build_workload()
    an = DocumentAnalyzer(
        # small model variants: the pinned wrappers below still run the
        # real device programs, but at test-sized shapes
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
        visualize=False,
        device="cpu",
    )
    # pin at the postprocess seams (real device programs still run); the
    # small det config's tiny real map would swallow the painted 20 px
    # lines, so paint on a fixed half-scale canvas (the postprocessor
    # rescales quads to the page by dest_w/dest_h anyway)
    bench._pin_analyzer(
        an, img, quads, paragraphs, tables, figure_box,
        paint_shape=(1, 640, 480),
    )
    results, _, _ = an(img)
    return img, quads, paragraphs, tables, results, an


def test_word_count_matches_detected_lines(analyzed):
    img, quads, paragraphs, tables, results, an = analyzed
    assert len(results.words) == len(quads)


def test_paragraphs_and_tables_structure(analyzed):
    img, quads, paragraphs, tables, results, an = analyzed
    assert len(results.tables) == len(tables) == 2
    for t in results.tables:
        assert t.n_row == 4 and t.n_col == 4
        assert len(t.cells) == 16
        # every cell of the synthetic grid received exactly one line
        filled = [c for c in t.cells if c.contents]
        assert len(filled) == 16
    assert len(results.paragraphs) == len(paragraphs)
    for p in results.paragraphs:
        assert p.contents  # every paragraph aggregated some text


def test_reading_order_covers_all_elements(analyzed):
    img, quads, paragraphs, tables, results, an = analyzed
    orders = [e.order for e in results.paragraphs + results.tables]
    # body elements get a contiguous 1..N order; figures order separately
    assert sorted(orders) == list(range(1, len(orders) + 1))
    assert all(f.order >= 0 for f in results.figures)


def test_exports_contain_structure(analyzed, tmp_path):
    img, quads, paragraphs, tables, results, an = analyzed
    md = results.to_markdown(str(tmp_path / "out.md"), img=img)
    # two 4x4 pipe tables with separator rows
    assert md.count("|-|-|-|-|") == 2
    html = results.to_html(str(tmp_path / "out.html"), img=img)
    assert html.count("<table") == 2


def test_batch_matches_single_call(analyzed):
    img, quads, paragraphs, tables, results, an = analyzed
    outs = an.batch([img, img])
    for res, _, _ in outs:
        assert len(res.words) == len(results.words)
        assert len(res.tables) == len(results.tables)
        assert [e.order for e in res.paragraphs] == [
            e.order for e in results.paragraphs
        ]
