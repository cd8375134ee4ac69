"""Weight store tests: msgpack roundtrip and offline random fallback."""

import numpy as np
import pytest

from yomitoku_tpu import weights as W
from yomitoku_tpu.config import structured
from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
from yomitoku_tpu.models.dbnet import DBNet


def test_msgpack_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("YOMITOKU_TPU_WEIGHTS", str(tmp_path))
    m = DBNet(structured(TextDetectorDBNetV2_1Config))
    params = m.init_params(0)
    path = tmp_path / "roundtrip.msgpack"
    W.save_params_msgpack(params, path)
    loaded = W.load_params_msgpack(params, path)
    flat_a = {
        "/".join(map(str, k)): v
        for k, v in _flatten(params).items()
    }
    flat_b = {
        "/".join(map(str, k)): v
        for k, v in _flatten(loaded).items()
    }
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]))


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def test_offline_fallback_warns(tmp_path, monkeypatch):
    import logging

    monkeypatch.setenv("YOMITOKU_TPU_WEIGHTS", str(tmp_path))
    m = DBNet(structured(TextDetectorDBNetV2_1Config))
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Capture()
    logging.getLogger("yomitoku_tpu.weights").addHandler(h)
    try:
        params = W.load_pretrained_params(m, m.cfg)
    finally:
        logging.getLogger("yomitoku_tpu.weights").removeHandler(h)
    assert params is not None
    assert any("RANDOM" in r for r in records)


def test_parity_compare_scores_matches_and_misses(tmp_path):
    """validate_real_weights --compare: IoU-matched det quads, string
    agreement on matched quads, per-category layout box matching."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from validate_real_weights import compare_module_outputs

    quad = lambda x, y, w, h: [[x, y], [x + w, y], [x + w, y + h], [x, y + h]]
    page = {
        "image": "p",
        "det": {"points": [quad(10, 10, 100, 20), quad(10, 50, 80, 20)],
                "scores": [0.9, 0.9]},
        "rec": {
            "contents": ["hello", "world"],
            "scores": [0.9, 0.9],
            "points": [quad(10, 10, 100, 20), quad(10, 50, 80, 20)],
            "directions": ["horizontal", "horizontal"],
        },
        "layout": {
            "paragraphs": [{"box": [5, 5, 200, 80], "score": 0.9, "role": None}],
            "tables": [], "figures": [],
        },
    }
    ours = tmp_path / "ours.json"
    ref = tmp_path / "ref.json"
    ours.write_text(json.dumps({"pages": [page]}))
    ref.write_text(json.dumps({"pages": [page]}))
    assert compare_module_outputs(ours, ref) is True

    import copy

    bad = copy.deepcopy(page)
    bad["rec"]["contents"] = ["hello", "w0rld"]  # one string off
    ours.write_text(json.dumps({"pages": [bad]}))
    assert compare_module_outputs(ours, ref) is False

    shifted = copy.deepcopy(page)
    shifted["det"]["points"][1] = quad(400, 400, 80, 20)  # quad misses
    shifted["rec"]["points"][1] = quad(400, 400, 80, 20)
    ours.write_text(json.dumps({"pages": [shifted]}))
    assert compare_module_outputs(ours, ref) is False
