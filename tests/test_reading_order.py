"""Reading-order differential tests: our implementation vs the REAL
reference reading_order module on randomized synthetic layouts, for all
three directions.  The priority DFS has subtle tie-breaking
(reading_order.py:14-82) — byte-exact order match is required."""

import numpy as np
import pytest


class _Para:
    """Minimal element: .box, .order, .dict() like a pydantic schema."""

    def __init__(self, box):
        self.box = list(map(int, box))
        self.order = 0
        self.contents = "x"

    def dict(self):
        return {"box": self.box, "order": self.order, "contents": self.contents}

    def model_dump(self):
        return self.dict()


def _random_boxes(rng, n, w=1000, h=1400):
    boxes = []
    for _ in range(n):
        x1 = rng.randint(0, w - 60)
        y1 = rng.randint(0, h - 30)
        bw = rng.randint(30, 300)
        bh = rng.randint(15, 120)
        boxes.append([x1, y1, min(x1 + bw, w), min(y1 + bh, h)])
    return boxes


@pytest.mark.parametrize("direction", ["top2bottom", "right2left", "left2right"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("n", [2, 5, 12, 30])
def test_reading_order_matches_reference(direction, seed, n):
    from tests.torch_ref.load_reference import load_reference_reading_order
    from yomitoku_tpu.reading_order import prediction_reading_order

    ref_mod = load_reference_reading_order()

    rng = np.random.RandomState(seed * 100 + n)
    boxes = _random_boxes(rng, n)

    ours = [_Para(b) for b in boxes]
    theirs = [_Para(b) for b in boxes]

    prediction_reading_order(ours, direction)
    ref_mod.prediction_reading_order(theirs, direction)

    assert [e.order for e in ours] == [e.order for e in theirs], (
        f"direction={direction} seed={seed} n={n} boxes={boxes}"
    )


def test_reading_order_single_element_noop():
    from yomitoku_tpu.reading_order import prediction_reading_order

    p = _Para([0, 0, 10, 10])
    prediction_reading_order([p], "top2bottom")
    assert p.order == 0
