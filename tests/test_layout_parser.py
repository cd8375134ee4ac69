"""LayoutParser module tests: config plumbing, end-to-end call on a small
spatial config (random weights), and the containment filtering rules
(reference layout_parser.py:28-75)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from yomitoku_tpu.layout_parser import (
    LayoutParser,
    filter_contained_rectangles_across_categories,
    filter_contained_rectangles_within_category,
)


def _el(box, score=0.9):
    return {"id": None, "box": box, "score": score, "role": None, "contents": None}


def test_within_category_containment_keeps_larger():
    elements = {
        "tables": [_el([0, 0, 100, 100]), _el([10, 10, 50, 50]), _el([200, 200, 250, 250])]
    }
    out = filter_contained_rectangles_within_category(elements)
    assert [e["box"] for e in out["tables"]] == [[0, 0, 100, 100], [200, 200, 250, 250]]


def test_across_category_containment_drops_contained_paragraphs():
    elements = {
        "tables": [_el([0, 0, 100, 100])],
        "paragraphs": [_el([10, 10, 50, 50]), _el([150, 150, 200, 200])],
    }
    out = filter_contained_rectangles_across_categories(elements, "tables", "paragraphs")
    assert [e["box"] for e in out["paragraphs"]] == [[150, 150, 200, 200]]


def test_layout_parser_end_to_end_small():
    lp = LayoutParser(
        path_cfg="tests/yaml/layout_small.yaml",
        device="cpu",
        from_pretrained=False,
    )
    assert lp._cfg.data.img_size == [128, 128]
    assert lp._cfg.RTDETRTransformerv2.num_queries == 20
    img = (np.random.RandomState(0).rand(200, 300, 3) * 255).astype(np.uint8)
    results, vis = lp(img)
    for cat in ("paragraphs", "tables", "figures"):
        for el in getattr(results, cat):
            x1, y1, x2, y2 = el.box
            assert 0 <= x1 and 0 <= y1 and x2 <= 300 and y2 <= 200
            assert el.score > lp.thresh_score
    assert vis is None
