"""Fused det+layout page program (ops/fused_page.py): the one-dispatch
packed-wire path must reproduce the two separate per-model page programs
bit-for-bit (same ops, same inputs — only the dispatch/readback schedule
differs), and DocumentAnalyzer._run_fused must match the threaded page
path end-to-end."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow
import jax.numpy as jnp  # noqa: E402

from yomitoku_tpu.config import structured  # noqa: E402
from yomitoku_tpu.ops.device_crop import DevicePage  # noqa: E402
from yomitoku_tpu.ops.fused_page import FusedDetLayout  # noqa: E402


def _page(h=256, w=320, seed=3):
    rng = np.random.RandomState(seed)
    page = np.full((h, w, 3), 255, np.uint8)
    for _ in range(12):
        x0, y0 = rng.randint(0, w - 90), rng.randint(0, h - 40)
        page[y0 : y0 + 24, x0 : x0 + 80] = rng.randint(0, 120, 3)
    return page


@pytest.fixture(scope="module")
def models():
    from yomitoku_tpu.configs import (
        LayoutParserRTDETRv2V2Config,
        TextDetectorDBNetV2_1Config,
    )
    from yomitoku_tpu.models.dbnet import DBNet
    from yomitoku_tpu.models.rtdetr import RTDETRv2

    det_cfg = structured(TextDetectorDBNetV2_1Config)
    det = DBNet(det_cfg)
    det.params = det.init_params(0)
    lay_cfg = structured(LayoutParserRTDETRv2V2Config)
    lay_cfg.data.img_size = [128, 128]
    lay_cfg.RTDETRTransformerv2.eval_spatial_size = [128, 128]
    lay_cfg.RTDETRTransformerv2.num_queries = 20
    lay = RTDETRv2(lay_cfg)
    lay.params = lay.init_params(0)
    return det, lay


def test_fused_matches_separate_programs(models):
    det, lay = models
    img = _page()
    page = DevicePage(img)
    det_hw = (128, 160)
    lay_hw = (128, 128)

    fused = FusedDetLayout(det, lay, num_top_queries=20)
    prob_f, packed_f = fused(page, page.hw, det_hw, lay_hw)

    # the fused wire keeps the prob map u8 (value = prob*255)
    prob_s = det.forward_binary_from_page(
        page.dev, page.hw, det_hw, as_u8=True
    )
    from yomitoku_tpu.ops.device_crop import region_mats
    from yomitoku_tpu.postprocessor.rtdetr_postprocessor import (
        RTDETRPostProcessor,
    )

    h, w = page.hw
    mats, _ = region_mats([(0, 0, w, h)], lay_hw)
    preds = lay.forward_from_page(page.dev, jnp.asarray(mats), lay_hw)
    post = RTDETRPostProcessor(num_classes=6, num_top_queries=20)
    packed_s = np.asarray(post.topk_on_device(preds, [[w, h]]))

    np.testing.assert_array_equal(prob_f, prob_s)
    np.testing.assert_allclose(packed_f, packed_s, atol=1e-5)


def test_document_analyzer_fused_matches_threaded(monkeypatch):
    """The full fused run must equal the threaded page path (same device
    programs, different schedule)."""
    import yomitoku_tpu.ops.device_crop as dc
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)

    analyzer = DocumentAnalyzer(
        configs={
            "ocr": {
                "text_detector": {
                    "path_cfg": "tests/yaml/det_small.yaml",
                    "from_pretrained": False,
                },
                "text_recognizer": {
                    "path_cfg": "tests/yaml/rec_small.yaml",
                    "from_pretrained": False,
                },
            },
            "layout_analyzer": {
                "layout_parser": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
                "table_structure_recognizer": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
            },
        },
        device="cpu",
    )
    img = _page(160, 240, seed=5)

    monkeypatch.setenv("YOMITOKU_TPU_NO_FUSED_PAGE", "1")
    threaded, _, _ = analyzer(img)
    monkeypatch.delenv("YOMITOKU_TPU_NO_FUSED_PAGE")
    fused, _, _ = analyzer(img)
    assert fused.model_dump() == threaded.model_dump()


def test_fused_slots_match_without_fallback(monkeypatch):
    """With detectable tables (spread+balanced score heads), the host's
    kept tables must match the device TSR slots — no fallback region
    dispatch."""
    import yomitoku_tpu.ops.device_crop as dc
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer
    from yomitoku_tpu.utils.synthetic_heads import (
        balance_final_score_head,
        spread_score_heads,
    )

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)
    analyzer = DocumentAnalyzer(
        configs={
            "ocr": {
                "text_detector": {
                    "path_cfg": "tests/yaml/det_small.yaml",
                    "from_pretrained": False,
                },
                "text_recognizer": {
                    "path_cfg": "tests/yaml/rec_small.yaml",
                    "from_pretrained": False,
                },
            },
            "layout_analyzer": {
                "layout_parser": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
                "table_structure_recognizer": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
            },
        },
        device="cpu",
    )
    lp = analyzer.layout.layout_parser
    lp.model.params = spread_score_heads(lp.model.params)
    img = _page(160, 240, seed=7)
    balance_final_score_head(lp.model, lp.preprocess(img))
    # drop the dedup so kept tables == top-score tables (the bench pins
    # the same way); keep at most 2
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
    results, _, _ = analyzer(img)
    assert hasattr(results, "tables")
    assert not calls, "fused TSR slots missed; fallback dispatched"


def test_fused_fallback_merge_beyond_max_tables(monkeypatch):
    """Kept tables beyond the fused program's max_tables slots must run
    through the chunked fallback region path and merge into the SAME
    result the threaded pipeline produces."""
    import yomitoku_tpu.ops.device_crop as dc
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)
    analyzer = DocumentAnalyzer(
        configs={
            "ocr": {
                "text_detector": {
                    "path_cfg": "tests/yaml/det_small.yaml",
                    "from_pretrained": False,
                },
                "text_recognizer": {
                    "path_cfg": "tests/yaml/rec_small.yaml",
                    "from_pretrained": False,
                },
            },
            "layout_analyzer": {
                "layout_parser": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
                "table_structure_recognizer": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
            },
        },
        device="cpu",
    )
    lp = analyzer.layout.layout_parser
    real_filtering = lp.filtering_elements

    def six_tables(preds):
        out = real_filtering(preds)
        tables = []
        for i in range(6):  # 6 kept > max_tables=4 slots
            dx = (i % 3) * 70
            dy = (i // 3) * 60
            tables.append({
                "id": f"t{i}", "contents": None, "role": None, "score": 0.9,
                "box": [10 + dx, 10 + dy, 75 + dx, 60 + dy],
            })
        out["tables"] = tables
        return out

    lp.filtering_elements = six_tables

    calls = []
    orig = dc.dispatch_regions_from_page

    def spy(*a, **k):
        calls.append(len(a[2]) if len(a) > 2 else 1)
        return orig(*a, **k)

    monkeypatch.setattr(dc, "dispatch_regions_from_page", spy)

    # prove the merge fills a filtered entry for every kept table (the
    # final schema drops tables whose random-weight TSR output has no
    # rows/cols — identically on both paths)
    tsr = analyzer.layout.table_structure_recognizer
    merged_counts = []
    real_tff = tsr.tables_from_filtered

    def spy_tff(data, filtered):
        merged_counts.append(
            (len(data), sum(f is None for f in filtered))
        )
        return real_tff(data, filtered)

    tsr.tables_from_filtered = spy_tff

    img = _page(160, 240, seed=11)
    monkeypatch.setenv("YOMITOKU_TPU_NO_FUSED_PAGE", "1")
    threaded, _, _ = analyzer(img)
    monkeypatch.delenv("YOMITOKU_TPU_NO_FUSED_PAGE")
    calls.clear()
    merged_counts.clear()
    fused, _, _ = analyzer(img)
    assert calls, "expected the fallback region path for tables beyond the slots"
    assert merged_counts == [(6, 0)], merged_counts  # all 6 merged, no holes
    assert fused.model_dump() == threaded.model_dump()


def _small_analyzer(num_devices=None):
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer

    return DocumentAnalyzer(
        configs={
            "ocr": {
                "text_detector": {
                    "path_cfg": "tests/yaml/det_small.yaml",
                    "from_pretrained": False,
                },
                "text_recognizer": {
                    "path_cfg": "tests/yaml/rec_small.yaml",
                    "from_pretrained": False,
                },
            },
            "layout_analyzer": {
                "layout_parser": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
                "table_structure_recognizer": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
            },
        },
        device="cpu",
        num_devices=num_devices,
    )


def _assert_close_dump(want, got, path=""):
    """Structural equality with a u8-wire-quantum tolerance on floats (the
    page-batched vmap program may quantize the u8 prob map one step apart
    from the solo program at exact .5 boundaries)."""
    if isinstance(want, dict):
        assert want.keys() == got.keys(), path
        for k in want:
            _assert_close_dump(want[k], got[k], f"{path}.{k}")
    elif isinstance(want, (list, tuple)):
        assert len(want) == len(got), path
        for i, (a, b) in enumerate(zip(want, got)):
            _assert_close_dump(a, b, f"{path}[{i}]")
    elif isinstance(want, float) or isinstance(got, float):
        assert abs(float(want) - float(got)) <= 2.0 / 255.0, (
            f"{path}: {want} != {got}"
        )
    else:
        assert want == got, f"{path}: {want!r} != {got!r}"


def test_fused_batch_call_matches_per_page(models):
    """FusedPageAnalysis.batch_call (page-axis vmap) must reproduce the
    per-page program's wire for every lane, on pages of distinct
    content (including a lane whose true size differs)."""
    from yomitoku_tpu.ops.device_crop import pad_page
    from yomitoku_tpu.ops.fused_page import FusedPageAnalysis

    det, lay = models
    prog = FusedPageAnalysis(
        det, lay, lay, lay_top_k=20, tsr_top_k=20, table_label=0,
        lay_thresh=0.5,
    )
    det_hw, lay_hw, tsr_hw = (128, 160), (128, 128), (128, 128)
    imgs = [_page(200, 300, seed=s) for s in (1, 2)] + [
        _page(180, 260, seed=3)
    ]
    stack = np.stack([pad_page(img, align=512) for img in imgs])
    pages_dev = jnp.asarray(stack)
    batched = prog.batch_call(
        pages_dev, [img.shape[:2] for img in imgs], det_hw, lay_hw, tsr_hw
    )
    for i, img in enumerate(imgs):
        page = DevicePage(img)
        solo = prog(page, page.hw, det_hw, lay_hw, tsr_hw)
        for name, a, b in zip(
            ("prob", "packed", "packed_t", "sel", "valid"), solo, batched[i]
        ):
            if name == "prob":
                # u8 wire: vmap vs single program may round one step apart
                assert np.abs(
                    a.astype(np.int16) - b.astype(np.int16)
                ).max() <= 1, name
            else:
                # box coords are pixel-unit floats; vmap-vs-single float
                # association noise sits at rel ~1e-5
                np.testing.assert_allclose(
                    a, b, rtol=1e-4, atol=1e-3, err_msg=name
                )


def test_batch_dp_fused_matches_solo(monkeypatch):
    """DocumentAnalyzer._batch_dp under a mesh must take the FUSED device
    path (DevicePage + separable crops + batched fused program) and match
    the solo fused run per page on DISTINCT pages."""
    import yomitoku_tpu.ops.device_crop as dc

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)
    solo = _small_analyzer()
    dp = _small_analyzer(num_devices=2)
    for a, b in (
        (dp.text_detector, solo.text_detector),
        (dp.text_recognizer, solo.text_recognizer),
        (dp.layout.layout_parser, solo.layout.layout_parser),
        (
            dp.layout.table_structure_recognizer,
            solo.layout.table_structure_recognizer,
        ),
    ):
        b.model.params = a.model.params
    imgs = [_page(160, 240, seed=s) for s in (5, 6, 7)]  # odd count: pad lane
    results = dp.batch(imgs)
    assert len(results) == 3
    assert dp._fused_page_program is not None, "fused DP path not taken"
    for img, (res, _, _) in zip(imgs, results):
        want = solo(img)[0].model_dump()
        _assert_close_dump(want, res.model_dump())


def test_batch_dp_single_chip_uses_page_batching(monkeypatch):
    """Without a mesh, _batch_dp_fused defaults to 1-page fused dispatches
    (chunk>=2 legs serialize their upload+sync on the transfer-bound
    tunnel — see the paired sweep note in document_analyzer.py), and the
    YOMITOKU_TPU_DP_CHUNK knob restores page batching."""
    import yomitoku_tpu.ops.device_crop as dc
    from yomitoku_tpu.ops.fused_page import FusedPageAnalysis

    monkeypatch.setattr(dc, "device_crops_enabled", lambda: True)
    analyzer = _small_analyzer()
    imgs = [_page(160, 240, seed=s) for s in (8, 9)]
    solo_dumps = [analyzer(img)[0].model_dump() for img in imgs]

    batch_calls = []
    orig = FusedPageAnalysis.batch_call

    def spy(self, pages_dev, hws, *a, **k):
        batch_calls.append(pages_dev.shape[0])
        return orig(self, pages_dev, hws, *a, **k)

    monkeypatch.setattr(FusedPageAnalysis, "batch_call", spy)
    results = analyzer._batch_dp_fused(imgs)
    assert batch_calls == [1, 1], batch_calls  # default: per-page legs
    for want, (res, _, _) in zip(solo_dumps, results):
        _assert_close_dump(want, res.model_dump())

    batch_calls.clear()
    monkeypatch.setenv("YOMITOKU_TPU_DP_CHUNK", "2")
    results = analyzer._batch_dp_fused(imgs)
    assert batch_calls == [2], batch_calls  # one 2-page dispatch
    for want, (res, _, _) in zip(solo_dumps, results):
        _assert_close_dump(want, res.model_dump())
