"""CellDetector.postprocess unit coverage (previously only reachable
through the full pipeline with a live model, so a NameError on the
whole-table containment check shipped unnoticed — regression guard)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def detector():
    from yomitoku_tpu.table_cell_detector import CellDetector

    # from_pretrained=False: random init, we only drive postprocess
    return CellDetector(from_pretrained=False)


def _preds(boxes, labels, scores):
    return {
        "boxes": np.asarray(boxes, np.float32),
        "labels": np.asarray(labels, np.int64),
        "scores": np.asarray(scores, np.float32),
    }


def test_postprocess_emits_cells_and_drops_whole_table(detector):
    cell_idx = detector._cfg.category.index("cell")
    data = {"size": (200, 400), "offset": (50, 60)}
    table_box = [50, 60, 450, 260]
    preds = _preds(
        boxes=[
            [0, 0, 400, 200],      # whole-table detection -> dropped
            [10, 10, 200, 90],     # real cell
            [210, 10, 390, 90],    # real cell
        ],
        labels=[cell_idx] * 3,
        scores=[0.9, 0.9, 0.9],
    )
    cells = detector.postprocess(preds, data, table_box)
    boxes = [c.box for c in cells if c.role == "cell"]
    # offsets applied back to page coordinates
    assert [60, 70, 250, 150] in boxes
    assert [260, 70, 440, 150] in boxes
    # the whole-table box must NOT survive as a detected cell
    assert [50, 60, 450, 260] not in boxes


def test_postprocess_empty_preds_falls_back_to_whole_table(detector):
    data = {"size": (200, 400), "offset": (0, 0)}
    table_box = [0, 0, 400, 200]
    preds = _preds(
        boxes=np.zeros((0, 4)), labels=np.zeros((0,)), scores=np.zeros((0,))
    )
    cells = detector.postprocess(preds, data, table_box)
    roles = {c.role for c in cells}
    assert "cell" in roles and "group" in roles
    assert any(c.box == list(table_box) for c in cells)
