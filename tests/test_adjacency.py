"""Differential fuzz of the vectorized adjacency kernels against the REAL
reference scalar predicates (yomitoku/utils/misc.py is_right_adjacent /
is_bottom_adjacent), over random boxes including touching, overlapping,
nested, degenerate-thin, and far-apart pairs."""

import numpy as np
import pytest

from yomitoku_tpu.utils.adjacency import (
    bottom_adjacency_matrix,
    right_adjacency_matrix,
)
from yomitoku_tpu.utils.misc import is_bottom_adjacent, is_right_adjacent

from tests.torch_ref.load_reference import load_reference_reading_order
import sys

load_reference_reading_order()  # mounts ref utils.misc
REF_MISC = sys.modules["ref_reading_order_pkg.utils.misc"]


def _random_boxes(rng, n, scale=300, integer=False):
    xy = rng.uniform(0, scale, size=(n, 2))
    wh = rng.uniform(1, scale / 3, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1)
    if integer:
        boxes = np.round(boxes)
    return boxes


@pytest.mark.parametrize("rule", ["soft", "hard", "nest", "child"])
@pytest.mark.parametrize("integer", [False, True])
def test_adjacency_matrix_matches_reference(rule, integer):
    rng = np.random.RandomState(hash((rule, integer)) % 2**31)
    for trial in range(8):
        n = rng.randint(2, 14)
        # mix far / near boxes: shrink the arena on odd trials so edges
        # actually land within the 15px thresholds
        scale = 60 if trial % 2 else 400
        boxes = _random_boxes(rng, n, scale=scale, integer=integer)
        R = right_adjacency_matrix(boxes, boxes, rule=rule)
        B = bottom_adjacency_matrix(boxes, boxes, rule=rule)
        for i in range(n):
            for j in range(n):
                assert R[i, j] == REF_MISC.is_right_adjacent(
                    boxes[i], boxes[j], rule=rule
                ), (rule, i, j, boxes[i], boxes[j])
                assert B[i, j] == REF_MISC.is_bottom_adjacent(
                    boxes[i], boxes[j], rule=rule
                ), (rule, i, j, boxes[i], boxes[j])


def test_scalar_wrappers_agree_with_matrix():
    rng = np.random.RandomState(7)
    boxes = _random_boxes(rng, 10, scale=80)
    for rule in ("soft", "hard", "nest", "child"):
        R = right_adjacency_matrix(boxes, boxes, rule=rule)
        B = bottom_adjacency_matrix(boxes, boxes, rule=rule)
        for i in range(10):
            for j in range(10):
                assert is_right_adjacent(boxes[i], boxes[j], rule=rule) == R[i, j]
                assert is_bottom_adjacent(boxes[i], boxes[j], rule=rule) == B[i, j]


def test_adjacency_empty_inputs():
    assert right_adjacency_matrix([], []).shape == (0, 0)
    assert bottom_adjacency_matrix([[0, 0, 1, 1]], []).shape == (1, 0)
    assert right_adjacency_matrix([], [[0, 0, 1, 1]]).shape == (0, 1)


def test_adjacency_touching_grid_cells():
    # two perfectly abutting unit cells: right- and bottom-adjacent (hard)
    a = [0, 0, 100, 40]
    right = [100, 0, 200, 40]
    below = [0, 40, 100, 80]
    diag = [100, 40, 200, 80]
    assert is_right_adjacent(a, right, rule="hard")
    assert is_bottom_adjacent(a, below, rule="hard")
    # diagonal contact is explicitly not adjacency
    assert not is_right_adjacent(a, diag)
    assert not is_bottom_adjacent(a, diag)
