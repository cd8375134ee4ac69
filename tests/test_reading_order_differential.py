"""Differential fuzz of reading-order estimation against the REAL
reference implementation (yomitoku/reading_order.py) on randomized
layouts: column stacks, side-by-side columns, scattered boxes, grids,
and overlapping/tied elements, in all three directions."""

import numpy as np
import pytest

from yomitoku_tpu.reading_order import prediction_reading_order

from tests.torch_ref.load_reference import load_reference_reading_order

REF = load_reference_reading_order()


class _El:
    def __init__(self, box):
        self.box = [float(v) for v in box]
        self.order = None

    def model_dump(self):
        return {"box": self.box, "order": self.order}

    dict = model_dump  # the reference calls pydantic-v1 .dict()


def _run_both(boxes, direction):
    ours = [_El(b) for b in boxes]
    ref = [_El(b) for b in boxes]
    prediction_reading_order(ours, direction)
    REF.prediction_reading_order(ref, direction)
    return [e.order for e in ours], [e.order for e in ref]


DIRECTIONS = ["top2bottom", "right2left", "left2right"]


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_simple_column(direction):
    boxes = [[10, 10, 200, 40], [10, 60, 200, 90], [10, 110, 200, 140]]
    ours, ref = _run_both(boxes, direction)
    assert ours == ref


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_two_columns(direction):
    boxes = [
        [10, 10, 100, 300],
        [120, 10, 210, 300],
        [10, 320, 210, 360],
    ]
    ours, ref = _run_both(boxes, direction)
    assert ours == ref


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("integer", [True, False])
def test_random_layouts(direction, integer):
    rng = np.random.RandomState(hash((direction, integer)) % 2**31)
    for trial in range(60):
        n = rng.randint(1, 18)
        xy = rng.uniform(0, 500, size=(n, 2))
        wh = rng.uniform(5, 180, size=(n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1)
        if integer:
            boxes = np.round(boxes)
        ours, ref = _run_both(boxes, direction)
        assert ours == ref, (direction, trial, boxes.tolist())


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_grid_with_ties(direction):
    # perfectly aligned grid: equal y1 rows create two-cycles in the
    # reference's graph; the deadlock-breaking path must match
    boxes = []
    for r in range(3):
        for c in range(3):
            boxes.append([c * 100, r * 50, c * 100 + 90, r * 50 + 40])
    ours, ref = _run_both(boxes, direction)
    assert ours == ref


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_duplicate_boxes(direction):
    boxes = [[0, 0, 50, 50]] * 3 + [[0, 100, 50, 150]]
    ours, ref = _run_both(boxes, direction)
    assert ours == ref


def test_invalid_direction():
    with pytest.raises(ValueError):
        prediction_reading_order([_El([0, 0, 1, 1]), _El([2, 2, 3, 3])], "bogus")


def test_short_input_passthrough():
    els = [_El([0, 0, 1, 1])]
    assert prediction_reading_order(els, "top2bottom") is els
    assert els[0].order is None
