"""Fused TableSemanticParser page path: det + layout + CellDetector run
as ONE device program (ops/fused_page.FusedPageAnalysis with the cell
model in the region slot); the result must equal the threaded page path
(same device programs, different dispatch schedule), including when kept
tables miss the device slots and take the fallback region dispatch."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow


def _page(h=256, w=320, seed=3):
    rng = np.random.RandomState(seed)
    page = np.full((h, w, 3), 255, np.uint8)
    for _ in range(12):
        x0, y0 = rng.randint(0, w - 90), rng.randint(0, h - 40)
        page[y0 : y0 + 24, x0 : x0 + 80] = rng.randint(0, 120, 3)
    return page


def _parser():
    from yomitoku_tpu.table_semantic_parser import TableSemanticParser

    return TableSemanticParser(
        configs={
            "table_detector": {
                "path_cfg": "tests/yaml/layout_small.yaml",
                "from_pretrained": False,
            },
            "table_cell_parser": {
                "path_cfg": "tests/yaml/layout_small.yaml",
                "from_pretrained": False,
            },
            "text_detector": {
                "path_cfg": "tests/yaml/det_small.yaml",
                "from_pretrained": False,
            },
            "text_recognizer": {
                "path_cfg": "tests/yaml/rec_small.yaml",
                "from_pretrained": False,
            },
        },
        device="cpu",
        visualize=False,
    )


def test_semantic_fused_matches_threaded(monkeypatch):
    import yomitoku_tpu.ops.device_crop as dc

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)
    parser = _parser()
    img = _page(160, 240, seed=5)

    monkeypatch.setenv("YOMITOKU_TPU_NO_FUSED_PAGE", "1")
    threaded, _, _ = parser(img)
    monkeypatch.delenv("YOMITOKU_TPU_NO_FUSED_PAGE")
    fused, _, _ = parser(img)
    assert fused.model_dump() == threaded.model_dump()


def test_semantic_fused_slots_match_without_fallback(monkeypatch):
    """With detectable tables (spread+balanced score heads), the kept
    tables must match the device cell-crop slots — no fallback region
    dispatch — and still equal the threaded result."""
    import yomitoku_tpu.ops.device_crop as dc
    from yomitoku_tpu.utils.synthetic_heads import (
        balance_final_score_head,
        spread_score_heads,
    )

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)
    parser = _parser()
    lp = parser.layout_parser
    lp.model.params = spread_score_heads(lp.model.params)
    img = _page(160, 240, seed=7)
    balance_final_score_head(lp.model, lp.preprocess(img))
    real_filtering = lp.filtering_elements

    def keep_top2(preds):
        out = real_filtering(preds)
        out["tables"] = out["tables"][:2]
        return out

    lp.filtering_elements = keep_top2

    calls = []
    orig = dc.dispatch_regions_from_page

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(dc, "dispatch_regions_from_page", spy)

    monkeypatch.setenv("YOMITOKU_TPU_NO_FUSED_PAGE", "1")
    threaded, _, _ = parser(img)
    monkeypatch.delenv("YOMITOKU_TPU_NO_FUSED_PAGE")
    calls.clear()
    fused, _, _ = parser(img)
    assert not calls, "fused cell slots missed; fallback dispatched"
    assert fused.model_dump() == threaded.model_dump()


def test_semantic_fused_fallback_merge(monkeypatch):
    """Host-injected tables never match device slots; every one must run
    through the chunked fallback region path and the merged result must
    equal the threaded pipeline's."""
    import yomitoku_tpu.ops.device_crop as dc

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)
    parser = _parser()
    lp = parser.layout_parser
    real_filtering = lp.filtering_elements

    def two_tables(preds):
        out = real_filtering(preds)
        out["tables"] = [
            {"id": None, "contents": None, "role": None, "score": 0.9,
             "box": [10 + 80 * i, 10, 75 + 80 * i, 70]}
            for i in range(2)
        ]
        return out

    lp.filtering_elements = two_tables

    calls = []
    orig = dc.dispatch_regions_from_page

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(dc, "dispatch_regions_from_page", spy)

    img = _page(160, 240, seed=11)
    monkeypatch.setenv("YOMITOKU_TPU_NO_FUSED_PAGE", "1")
    threaded, _, _ = parser(img)
    monkeypatch.delenv("YOMITOKU_TPU_NO_FUSED_PAGE")
    calls.clear()
    fused, _, _ = parser(img)
    assert calls, "expected the fallback region path for unmatched tables"
    assert fused.model_dump() == threaded.model_dump()


def test_semantic_batch_dp_fused_matches_solo(monkeypatch):
    """The page-DP semantic path (batched fused dispatch + pipelined host
    tails) must reproduce the per-page fused path exactly, in input
    order, on DISTINCT pages; batch() routes to it when num_devices > 1
    and visualization is off."""
    import yomitoku_tpu.ops.device_crop as dc
    from yomitoku_tpu.ops.fused_page import FusedPageAnalysis

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)
    parser = _parser()
    imgs = [_page(160, 240, seed=s) for s in (5, 11)]
    solo = [parser(img)[0].model_dump() for img in imgs]

    batch_calls = []
    orig = FusedPageAnalysis.batch_call

    def spy(self, pages_dev, hws, *a, **k):
        batch_calls.append(pages_dev.shape[0])
        return orig(self, pages_dev, hws, *a, **k)

    monkeypatch.setattr(FusedPageAnalysis, "batch_call", spy)
    results = parser._batch_dp_fused(imgs)
    assert batch_calls == [1, 1], batch_calls  # single-chip: per-page legs
    for want, (res, _, _) in zip(solo, results):
        assert res.model_dump() == want

    # batch() routes to the DP path under a multi-device request
    batch_calls.clear()
    parser.num_devices = 2
    results = parser.batch(imgs)
    assert batch_calls, "batch() did not route to the DP path"
    for want, (res, _, _) in zip(solo, results):
        assert res.model_dump() == want
