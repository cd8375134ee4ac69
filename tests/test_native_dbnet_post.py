"""Differential tests: native (C++) DBNet postprocessor vs the cv2/numpy
path on synthetic probability maps."""

import os

import cv2
import numpy as np
import pytest

from yomitoku_tpu.postprocessor.dbnet_postprocessor import DBnetPostProcessor

PP_KW = dict(
    min_size=3, thresh=0.3, box_thresh=0.4, max_candidates=300,
    unclip_ratio=3.5,
)


def _run_both(prob, dest):
    pp = DBnetPostProcessor(**PP_KW)
    preds = {"binary": prob[None]}
    os.environ.pop("YOMITOKU_TPU_NO_NATIVE_POST", None)
    native = pp(preds, dest)
    os.environ["YOMITOKU_TPU_NO_NATIVE_POST"] = "1"
    try:
        ref = pp(preds, dest)
    finally:
        os.environ.pop("YOMITOKU_TPU_NO_NATIVE_POST", None)
    return native, ref


def _match(native, ref, tol_px=3):
    nq, ns = native
    rq, rs = ref
    assert len(nq) == len(rq), (len(nq), len(rq))
    # order-invariant matching by nearest (centroid, extent) — extent
    # disambiguates concentric boxes (e.g. a ring and a blob in its hole)
    def feat(q):
        q = np.array(q)
        return np.concatenate([q.mean(axis=0), q.max(axis=0) - q.min(axis=0)])

    rcent = [feat(q) for q in rq]
    for q, s in zip(nq, ns):
        c = feat(q)
        d = [np.linalg.norm(c - rc) for rc in rcent]
        j = int(np.argmin(d))
        assert d[j] < tol_px * 2, (c, rcent)
        np.testing.assert_allclose(
            np.array(q), np.array(rq[j]), atol=tol_px,
        )
        assert abs(s - rs[j]) < 0.05


def test_axis_aligned_blobs():
    prob = np.zeros((160, 224), np.float32)
    prob[20:40, 30:120] = 0.9
    prob[60:75, 40:200] = 0.8
    prob[100:112, 10:90] = 0.85
    native, ref = _run_both(prob, (320, 448))
    assert len(native[0]) == 3
    _match(native, ref)


def test_rotated_blob():
    prob = np.zeros((200, 200), np.float32)
    quad = np.array([[40, 60], [150, 40], [156, 70], [46, 90]], np.int32)
    cv2.fillPoly(prob, [quad], 0.9)
    native, ref = _run_both(prob, (200, 200))
    assert len(native[0]) == 1
    _match(native, ref, tol_px=4)


def test_below_threshold_filtered():
    prob = np.zeros((100, 100), np.float32)
    prob[10:30, 10:60] = 0.35  # above binarize thresh, below box_thresh
    native, ref = _run_both(prob, (100, 100))
    assert native[0] == [] and ref[0] == []


def test_tiny_blob_filtered():
    prob = np.zeros((64, 64), np.float32)
    prob[10:12, 10:12] = 0.9  # smaller than min_size
    native, ref = _run_both(prob, (64, 64))
    assert native[0] == [] and ref[0] == []


def test_diagonal_touching_merges():
    # 8-connectivity: diagonally touching pixels form one component (as
    # cv2.findContours treats them)
    prob = np.zeros((60, 60), np.float32)
    prob[10:20, 10:20] = 0.9
    prob[20:30, 20:30] = 0.9
    native, _ = _run_both(prob, (60, 60))
    assert len(native[0]) == 1


def test_hollow_component_scores_filled_contour():
    # Ring: the filled-contour score includes the (low-prob) hole, so both
    # paths agree; a foreground-only score would be biased high.
    prob = np.zeros((80, 80), np.float32)
    prob[10:50, 10:50] = 0.9
    prob[22:38, 22:38] = 0.0  # hole
    native, ref = _run_both(prob, (80, 80))
    assert len(native[0]) == 1
    _match(native, ref)
    # filled mean = (1600-256)*0.9/1600 = 0.756, not the fg-only 0.9
    assert abs(native[1][0] - 0.756) < 0.02


def test_hollow_component_dropped_at_box_thresh():
    # Near box_thresh, the hole pulls the filled-contour mean below the
    # cutoff: both paths must DROP the box (the old foreground-only native
    # score of 0.55 would have kept it).
    prob = np.zeros((60, 60), np.float32)
    prob[10:40, 10:40] = 0.55
    prob[15:35, 15:35] = 0.0  # large hole: filled mean = 500*0.55/900 ≈ 0.31
    native, ref = _run_both(prob, (60, 60))
    assert native[0] == [] and ref[0] == []


def test_concave_open_valley_excluded():
    # U shape: the valley is border-connected background — outside the
    # filled outer contour, so it must NOT dilute the score on either path.
    prob = np.zeros((80, 80), np.float32)
    prob[10:60, 10:20] = 0.9   # left arm
    prob[10:60, 40:50] = 0.9   # right arm
    prob[50:60, 10:50] = 0.9   # base
    native, ref = _run_both(prob, (80, 80))
    assert len(native[0]) == 1
    _match(native, ref)
    assert native[1][0] > 0.85  # valley excluded -> mean stays ~0.9


def test_nested_component_in_hole():
    # A separate blob inside another component's hole: the outer box's
    # filled contour covers the nested blob's pixels too.
    prob = np.zeros((100, 100), np.float32)
    prob[10:70, 10:70] = 0.9
    prob[25:55, 25:55] = 0.0   # hole
    prob[35:45, 35:45] = 0.8   # nested blob inside the hole
    native, ref = _run_both(prob, (100, 100))
    assert len(native[0]) == 2
    _match(native, ref)


def test_empty_map():
    prob = np.zeros((64, 64), np.float32)
    native, ref = _run_both(prob, (64, 64))
    assert native[0] == [] and ref[0] == []


def test_scaling_to_dest():
    prob = np.zeros((100, 100), np.float32)
    prob[20:50, 20:80] = 0.9
    (quads, _), _ = _run_both(prob, (1000, 1000))
    q = np.array(quads[0])
    assert q.max() > 500  # scaled up 10x
    assert q.min() >= 0 and q.max() <= 1000


def test_u8_wire_map_matches_float_path():
    """The u8 entry point (map value = prob*255) must make identical
    quad/keep decisions to converting the map to float32 first, with
    scores equal to float rounding."""
    rng = np.random.RandomState(7)
    prob_u8 = np.zeros((96, 128), np.uint8)
    # several blobs straddling the 0.3 threshold boundary (76/77)
    prob_u8[10:20, 10:40] = 230
    prob_u8[30:42, 50:90] = rng.randint(60, 255, (12, 40), np.uint8)
    prob_u8[60:70, 20:60] = 77   # exactly one count above threshold
    prob_u8[80:86, 70:110] = 76  # exactly at/below threshold: dropped
    prob_f32 = prob_u8.astype(np.float32) * (1.0 / 255.0)

    pp = DBnetPostProcessor(**PP_KW)
    os.environ.pop("YOMITOKU_TPU_NO_NATIVE_POST", None)
    qu, su = pp({"binary": prob_u8[None]}, (96, 128))
    qf, sf = pp({"binary": prob_f32[None]}, (96, 128))
    assert qu == qf
    np.testing.assert_allclose(su, sf, atol=1e-5)


def test_u8_wire_map_cv2_fallback():
    """With the native path disabled, a u8 map must still postprocess
    (converted internally) and match the float path."""
    prob_u8 = np.zeros((64, 96), np.uint8)
    prob_u8[12:24, 16:64] = 240
    prob_f32 = prob_u8.astype(np.float32) * (1.0 / 255.0)
    pp = DBnetPostProcessor(**PP_KW)
    os.environ["YOMITOKU_TPU_NO_NATIVE_POST"] = "1"
    try:
        qu, su = pp({"binary": prob_u8[None]}, (64, 96))
        qf, sf = pp({"binary": prob_f32[None]}, (64, 96))
    finally:
        os.environ.pop("YOMITOKU_TPU_NO_NATIVE_POST", None)
    assert qu == qf
    np.testing.assert_allclose(su, sf, atol=1e-6)
