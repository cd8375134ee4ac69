"""TableStructureRecognizer: cell extraction / span merge unit tests
(reference table_structure_recognizer.py:27-86) + small e2e."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from yomitoku_tpu.table_structure_recognizer import (
    TableStructureRecognizer,
    extract_cells,
    filter_contained_cells_within_spancell,
)


def test_extract_cells_grid():
    rows = [[0, 0, 100, 10], [0, 20, 100, 30]]
    cols = [[0, 0, 40, 30], [60, 0, 100, 30]]
    cells = extract_cells(rows, cols)
    assert len(cells) == 4
    assert cells[0] == {
        "col": 1, "row": 1, "col_span": 1, "row_span": 1,
        "box": [0, 0, 40, 10], "contents": None,
    }
    assert cells[3]["box"] == [60, 20, 100, 30]


def test_extract_cells_no_intersection_skipped():
    rows = [[0, 0, 10, 10]]
    cols = [[50, 50, 60, 60]]
    assert extract_cells(rows, cols) == []


def test_span_merge():
    rows = [[0, 0, 100, 10], [0, 20, 100, 30]]
    cols = [[0, 0, 40, 30], [60, 0, 100, 30]]
    cells = extract_cells(rows, cols)
    # span covering the whole first column (rows 1-2, col 1)
    span_boxes = [[0, 0, 40, 30]]
    merged = filter_contained_cells_within_spancell(cells, span_boxes)
    spanned = [c for c in merged if c["row_span"] == 2]
    assert len(spanned) == 1
    assert spanned[0]["col"] == 1 and spanned[0]["col_span"] == 1
    assert spanned[0]["box"] == [0, 0, 40, 30]
    # the two col-1 cells were merged away
    assert len(merged) == 3


def test_tsr_end_to_end_small():
    tsr = TableStructureRecognizer(
        path_cfg="tests/yaml/layout_small.yaml",
        device="cpu",
        from_pretrained=False,
    )
    img = (np.random.RandomState(0).rand(300, 400, 3) * 255).astype(np.uint8)
    outputs, vis = tsr(img, [[50, 50, 250, 200]])
    for table in outputs:
        assert table.n_row > 0 and table.n_col > 0
        assert table.box == [50, 50, 250, 200]
    outputs2, _ = tsr(img, [])
    assert outputs2 == []
