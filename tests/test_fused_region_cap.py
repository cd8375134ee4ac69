"""Capped fused region wire (YOMITOKU_TPU_FUSED_REGION_TOPK).

The fused page program ships only the top-k region rows per slot (the
CellDetector's full 2500-query top-k costs 240 KB/page on a
round-trip-priced link).  consume_region_slots must (a) keep slots whose
kept rows fit the cap, (b) LOUDLY re-dispatch any slot whose capped list
saturated above threshold (rows k+1.. could have passed too — never a
silent truncation), and (c) leave uncapped programs untouched.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from yomitoku_tpu.ops.fused_page import FusedPageAnalysis  # noqa: E402
from yomitoku_tpu.postprocessor.rtdetr_postprocessor import (  # noqa: E402
    RTDETRPostProcessor,
)


def _prog(monkeypatch, cap, tsr_top_k=10):
    monkeypatch.setenv("YOMITOKU_TPU_FUSED_REGION_TOPK", str(cap))
    return FusedPageAnalysis(
        None, None, None, lay_top_k=5, tsr_top_k=tsr_top_k, table_label=0,
        lay_thresh=0.5,
    )


def _packed(rows_scores, k):
    """(1, k, 6) wire rows [label, score, x1, y1, x2, y2]."""
    rows = np.zeros((1, k, 6), np.float32)
    for i, s in enumerate(rows_scores):
        rows[0, i] = [1.0, s, 1.0, 1.0, 5.0, 5.0]
    return rows


def test_cap_env_clamps_wire_k(monkeypatch):
    assert _prog(monkeypatch, 4).tsr_k == 4
    assert _prog(monkeypatch, 4).tsr_full_k == 10
    assert _prog(monkeypatch, 0).tsr_k == 10  # 0 disables the cap
    assert _prog(monkeypatch, 64).tsr_k == 10  # cap above full-k: no-op


def test_saturated_slot_redispatches_loudly(monkeypatch, capfd):
    prog = _prog(monkeypatch, 4)
    post = RTDETRPostProcessor(num_classes=8, num_top_queries=10)
    region_data = [
        {"offset": (0, 0), "size": (10, 10)},
        {"offset": (20, 0), "size": (10, 10)},
    ]
    sel = np.array([[0, 0, 10, 10], [20, 0, 30, 10]], np.int64)
    sel_valid = np.array([True, True])
    packed_t = np.stack(
        [
            _packed([0.9, 0.8, 0.7, 0.6], 4),  # all 4 above 0.5: saturated
            _packed([0.9, 0.8, 0.2, 0.1], 4),  # 2 above: safe
        ]
    )

    filtered, missing_idx, missing_data = prog.consume_region_slots(
        region_data, packed_t, sel, sel_valid, post, 0.5
    )
    assert missing_idx == [0]
    assert missing_data == [region_data[0]]
    assert filtered[0] is None
    assert len(filtered[1]["scores"]) == 2
    assert "saturated" in capfd.readouterr().err


def test_uncapped_slot_keeps_full_list(monkeypatch):
    # cap >= full k: a fully-saturated slot is legitimate (the program
    # shipped every row there is) and must NOT re-dispatch
    prog = _prog(monkeypatch, 64, tsr_top_k=4)
    post = RTDETRPostProcessor(num_classes=8, num_top_queries=4)
    region_data = [{"offset": (0, 0), "size": (10, 10)}]
    sel = np.array([[0, 0, 10, 10]], np.int64)
    sel_valid = np.array([True])
    packed_t = _packed([0.9, 0.8, 0.7, 0.6], 4)[None]
    filtered, missing_idx, _ = prog.consume_region_slots(
        region_data, packed_t, sel, sel_valid, post, 0.5
    )
    assert missing_idx == []
    assert len(filtered[0]["scores"]) == 4


def test_unmatched_slot_still_falls_back(monkeypatch):
    prog = _prog(monkeypatch, 4)
    post = RTDETRPostProcessor(num_classes=8, num_top_queries=10)
    region_data = [{"offset": (5, 5), "size": (10, 10)}]  # no slot match
    sel = np.array([[0, 0, 10, 10]], np.int64)
    sel_valid = np.array([True])
    packed_t = _packed([0.9], 4)[None]
    filtered, missing_idx, missing_data = prog.consume_region_slots(
        region_data, packed_t, sel, sel_valid, post, 0.5
    )
    assert missing_idx == [0] and filtered == [None]
