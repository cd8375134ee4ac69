"""Equivalence tests: vectorized containment filters vs the original
scalar loops (which the reference implements one pair at a time)."""

import numpy as np

from yomitoku_tpu.table_cell_detector import (
    filter_contained_groups,
    filter_contained_rectangles_across_categories,
    filter_contained_rectangles_with_category,
)
from yomitoku_tpu.utils.misc import (
    calc_overlap_ratio,
    containment_matrix,
    is_contained,
    overlap_ratio_matrix,
)


def _rand_boxes(rng, n, size=200):
    x1 = rng.randint(0, size, n)
    y1 = rng.randint(0, size, n)
    w = rng.randint(1, 60, n)
    h = rng.randint(1, 60, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(float)


def test_overlap_matrix_matches_scalar():
    rng = np.random.RandomState(0)
    a = _rand_boxes(rng, 17)
    b = _rand_boxes(rng, 23)
    m = overlap_ratio_matrix(a, b)
    for i in range(len(a)):
        for j in range(len(b)):
            r, _ = calc_overlap_ratio(a[i], b[j])
            assert abs(m[i, j] - r) < 1e-9


def test_containment_matrix_matches_scalar():
    rng = np.random.RandomState(1)
    a = _rand_boxes(rng, 20)
    m = containment_matrix(a, a)
    for i in range(len(a)):
        for j in range(len(a)):
            assert m[i, j] == is_contained(a[i], a[j])


def _scalar_within_category(elements):
    boxes = [e["box"] for e in elements]
    check = [True] * len(boxes)
    for i, bi in enumerate(boxes):
        for j, bj in enumerate(boxes):
            if i >= j:
                continue
            ij = is_contained(bi, bj)
            ji = is_contained(bj, bi)
            ai = (bi[2] - bi[0]) * (bi[3] - bi[1])
            aj = (bj[2] - bj[0]) * (bj[3] - bj[1])
            if ij and ji:
                if ai > aj:
                    check[j] = False
                else:
                    check[i] = False
            elif ij:
                check[i] = False
            elif ji:
                check[j] = False
    return [e for e, c in zip(elements, check) if c]


def test_within_category_filter_equivalence():
    rng = np.random.RandomState(2)
    for seed in range(5):
        rng = np.random.RandomState(seed)
        els = [
            {"box": b.tolist(), "id": i}
            for i, b in enumerate(_rand_boxes(rng, 40, size=120))
        ]
        # add exact duplicates and nested boxes to hit the mutual branch
        els.append({"box": els[0]["box"], "id": 100})
        b = els[1]["box"]
        els.append({"box": [b[0] + 1, b[1] + 1, b[2] - 1, b[3] - 1], "id": 101})
        got = filter_contained_rectangles_with_category({"cell": list(els)})
        want = _scalar_within_category(els)
        assert [e["id"] for e in got["cell"]] == [e["id"] for e in want]


def _scalar_groups(groups):
    check = [True] * len(groups)
    for i, gi in enumerate(groups):
        for j, gj in enumerate(groups):
            if i == j or gi["box"] == gj["box"]:
                continue
            if is_contained(gj["box"], gi["box"], threshold=0.9):
                check[i] = False
                break
    return [g for g, c in zip(groups, check) if c]


def test_groups_filter_equivalence():
    for seed in range(5):
        rng = np.random.RandomState(seed + 10)
        groups = [
            {"box": b.tolist(), "id": i}
            for i, b in enumerate(_rand_boxes(rng, 30, size=100))
        ]
        groups.append({"box": groups[0]["box"], "id": 200})  # identical pair
        got = filter_contained_groups({"group": list(groups)})
        want = _scalar_groups(groups)
        assert [g["id"] for g in got["group"]] == [g["id"] for g in want]


def test_across_categories_equivalence():
    rng = np.random.RandomState(3)
    src = [{"box": b.tolist()} for b in _rand_boxes(rng, 15, size=100)]
    tgt = [
        {"box": b.tolist(), "id": i}
        for i, b in enumerate(_rand_boxes(rng, 25, size=100))
    ]
    got = filter_contained_rectangles_across_categories(
        {"s": src, "t": list(tgt)}, "s", "t"
    )
    keep = [
        e for e in tgt
        if not any(is_contained(s["box"], e["box"]) for s in src)
    ]
    assert [e["id"] for e in got["t"]] == [e["id"] for e in keep]
