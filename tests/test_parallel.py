"""Multi-device sharding tests on the virtual 8-device CPU mesh
(conftest.py forces JAX_PLATFORMS=cpu with
xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import pytest

from yomitoku_tpu.config import structured
from yomitoku_tpu.parallel import (
    DataParallel,
    dp_pages,
    make_mesh,
    parseq_param_shardings,
    shard_batch,
    shard_params,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
]


def _tiny_parseq():
    from yomitoku_tpu.configs import TextRecognizerPARSeqTinyConfig
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = structured(TextRecognizerPARSeqTinyConfig)
    cfg.encoder.depth = 1
    cfg.encoder.embed_dim = 32
    cfg.encoder.num_heads = 2
    cfg.decoder.embed_dim = 32
    cfg.decoder.num_heads = 2
    cfg.num_tokens = 16
    cfg.max_label_length = 4
    cfg.data.img_size = [16, 32]
    m = PARSeq(cfg)
    m.params = m.init_params(0)
    return m


def _tiny_dbnet():
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.models.dbnet import DBNet

    m = DBNet(structured(TextDetectorDBNetV2_1Config))
    m.params = m.init_params(0)
    return m


def test_dp_pages_dbnet():
    m = _tiny_dbnet()
    pages = np.random.RandomState(0).rand(5, 64, 64, 3).astype(np.float32)
    out = dp_pages(m, pages, n_devices=8)
    assert out.shape == (5, 64, 64)
    # parity with single-device path
    single = m._fwd(m.params, pages[:2])
    np.testing.assert_allclose(out[:2], np.asarray(single), atol=1e-4)


def test_dp_parseq_tokens():
    m = _tiny_parseq()
    mesh = make_mesh(8, tp=1)
    # _tokens_fn packs (ids, probs) as (2, B, L): batch rides axis 1
    run = DataParallel(mesh, m._tokens_fn, m.params, batch_axis=1)
    h, w = m.core.img_size
    crops = np.random.RandomState(1).rand(11, h, w, 3).astype(np.float32)
    ids, probs = run(crops, True, 1)
    assert ids.shape == (11, m.max_label_length + 1)
    assert probs.shape == ids.shape
    ref_ids, ref_probs = m._tokens_fn(m.params, crops, True, 1)
    np.testing.assert_array_equal(ids, np.asarray(ref_ids))
    np.testing.assert_allclose(probs, np.asarray(ref_probs), atol=1e-5)


def test_dp_tp_mesh_parseq():
    """2-D mesh: dp over crops, tp over the vocab head/embedding."""
    m = _tiny_parseq()
    mesh = make_mesh(8, tp=2)
    params = shard_params(m.params, parseq_param_shardings(m.params, mesh))
    h, w = m.core.img_size
    batch = np.random.RandomState(2).rand(8, h, w, 3).astype(np.float32)
    images, n = shard_batch(mesh, batch)
    with mesh:
        ids, probs = m._tokens_fn(params, images, True, 1)
    ref_ids, _ = m._tokens_fn(m.params, batch, True, 1)
    np.testing.assert_array_equal(np.asarray(ids)[:n], np.asarray(ref_ids))


def test_shard_batch_pads():
    mesh = make_mesh(8, tp=1)
    batch = np.ones((3, 4), np.float32)
    sharded, n = shard_batch(mesh, batch)
    assert n == 3 and sharded.shape[0] == 8


# ---------------------------------------------------------------------------
# Pipeline integration: num_devices plumbing through the task modules
# ---------------------------------------------------------------------------


def test_recognizer_dp_parity():
    """TextRecognizer(num_devices=8) shards crop batches over the mesh and
    must produce the same strings/scores as the single-device module."""
    from yomitoku_tpu.text_recognizer import TextRecognizer

    kwargs = dict(model_name="parseq-tiny", from_pretrained=False, device="cpu")
    solo = TextRecognizer(**kwargs)
    dp = TextRecognizer(num_devices=8, **kwargs)
    dp.model.params = solo.model.params  # identical random weights

    assert dp.model._mesh is not None and dp.model._mesh.shape["dp"] == 8

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (200, 400, 3), np.uint8)
    quads = [
        [[10, y, ], [390, y], [390, y + 20], [10, y + 20]]
        for y in range(5, 165, 20)
    ]
    quads = [[[q[0][0], q[0][1]], [q[1][0], q[1][1]],
              [q[2][0], q[2][1]], [q[3][0], q[3][1]]] for q in quads]

    res_solo, _ = solo(img, quads)
    res_dp, _ = dp(img, quads)
    assert res_dp.contents == res_solo.contents
    np.testing.assert_allclose(res_dp.scores, res_solo.scores, atol=1e-5)
    assert res_dp.directions == res_solo.directions


def test_detector_dp_batch_parity():
    """DBNet with a mesh shards page batches; prob maps must match the
    single-device forward."""
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.models.dbnet import DBNet
    from yomitoku_tpu.parallel import dp_mesh

    m = DBNet(structured(TextDetectorDBNetV2_1Config))
    m.params = m.init_params(0)
    pages = np.random.RandomState(1).randint(
        0, 255, (8, 64, 96, 3), np.uint8
    )
    solo = m.forward_binary_u8(pages)
    m.use_mesh(dp_mesh(8))
    sharded = m.forward_binary_u8(pages)
    # prob maps return float16 — allow one f16 ulp of reduction-order skew
    np.testing.assert_allclose(sharded, solo, atol=1e-3)


def test_rtdetr_dp_batch_parity():
    """RT-DETR (TSR config) with a mesh shards table-crop batches."""
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TableStructureRecognizerRTDETRv2Config
    from yomitoku_tpu.models.rtdetr import RTDETRv2
    from yomitoku_tpu.parallel import dp_mesh

    cfg = structured(TableStructureRecognizerRTDETRv2Config)
    m = RTDETRv2(cfg)
    m.params = m.init_params(0)
    # 320x320: smallest size whose flattened positions cover the 300
    # top-k queries (40^2 + 20^2 + 10^2)
    tiles = np.random.RandomState(2).rand(8, 320, 320, 3).astype(np.float32)
    solo = {k: np.asarray(v) for k, v in m.forward(tiles).items()}
    m.use_mesh(dp_mesh(8))
    out = {k: np.asarray(v) for k, v in m.forward(tiles).items()}
    # Sharded vs solo compiles fuse reductions differently; with random
    # weights the encoder scores are tightly clustered, so a few queries
    # at the top-300 selection boundary may swap.  Verify at QUERY-ROW
    # granularity that every divergence is a selection swap, not numeric
    # corruption: >=97% of rows must match in place, and each mismatched
    # row must pair (boxes AND logits) with some solo row of the same
    # image — except at most 3 boundary rows per image whose swapped-in
    # query was never in solo's top-k at all.
    B, Q = out["pred_boxes"].shape[:2]
    for b in range(B):
        bo, bs = out["pred_boxes"][b], solo["pred_boxes"][b]
        lo, ls = out["pred_logits"][b], solo["pred_logits"][b]
        inplace = (
            np.isclose(bo, bs, atol=1e-4).all(-1)
            & np.isclose(lo, ls, atol=1e-3).all(-1)
        )
        assert inplace.mean() > 0.97, (
            f"img {b}: only {inplace.mean():.4f} of query rows match"
        )
        boundary = 0
        for q in np.nonzero(~inplace)[0]:
            d = np.abs(bs - bo[q]).max(-1)
            j = int(d.argmin())
            if d[j] < 1e-3 and np.allclose(lo[q], ls[j], atol=5e-3):
                continue  # a swap: same query content, different slot
            boundary += 1
        assert boundary <= 3, (
            f"img {b}: {boundary} mismatched rows pair with no solo row "
            "(numeric corruption, not selection swaps)"
        )


def test_uneven_batch_falls_back_to_single_device():
    """Batches not divisible by dp run unsharded (no padding surprises)."""
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.models.dbnet import DBNet
    from yomitoku_tpu.parallel import dp_mesh

    m = DBNet(structured(TextDetectorDBNetV2_1Config))
    m.params = m.init_params(0)
    m.use_mesh(dp_mesh(8))
    pages = np.random.RandomState(3).randint(0, 255, (3, 64, 64, 3), np.uint8)
    out = m.forward_binary_u8(pages)
    assert out.shape == (3, 64, 64)


def test_dp_mesh_gating():
    from yomitoku_tpu.parallel import dp_mesh

    assert dp_mesh(None) is None
    assert dp_mesh(1) is None
    assert dp_mesh(0) is None
    m = dp_mesh(-1)
    assert m is not None and m.shape["dp"] == 8
    assert dp_mesh(4).shape["dp"] == 4
    assert dp_mesh(99).shape["dp"] == 8  # clamped to available


def test_document_analyzer_batch_page_dp():
    """batch() with num_devices>1 issues stage-batched, mesh-sharded
    forwards (page-axis DP, SURVEY §2.3) and keeps pages independent."""
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer

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
        num_devices=8,
    )
    assert analyzer.text_detector.model._mesh is not None

    placements = []
    for model in (analyzer.text_detector.model,
                  analyzer.layout.layout_parser.model):
        orig = model.place_batch

        def spy(arr, _orig=orig, _m=model):
            out = _orig(arr)
            placements.append(
                (_m.trace_stage, np.asarray(arr).shape[0],
                 len(out.sharding.device_set))
            )
            return out

        model.place_batch = spy

    img = (np.random.RandomState(3).rand(160, 240, 3) * 255).astype(np.uint8)
    results = analyzer.batch([img] * 8)
    assert len(results) == 8

    # the det and layout stages each saw ONE 8-page batch sharded over
    # all 8 devices (not 8 batch-1 forwards)
    assert ("det", 8, 8) in placements
    assert ("layout", 8, 8) in placements

    # identical input pages -> identical per-page results (no cross-page
    # offset/ownership mixups in the stage batching)
    first = results[0][0].model_dump()
    for res, _, _ in results[1:]:
        assert res.model_dump() == first


def test_batch_dp_fused_singlechip_chunks_match_solo(monkeypatch):
    """The fused page-DP path without a mesh (single-chip batching): 3
    distinct pages through chunk size 2 — one full chunk plus one padded
    chunk — must match the per-page solo path, and the chunk pipeline
    must preserve input order."""
    monkeypatch.setenv("YOMITOKU_TPU_DEVICE_CROPS", "1")
    monkeypatch.setenv("YOMITOKU_TPU_DP_CHUNK", "2")
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer

    cfgs = {
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
    }
    analyzer = DocumentAnalyzer(configs=cfgs, device="cpu")
    solo = DocumentAnalyzer(configs=cfgs, device="cpu")
    for a, b in (
        (analyzer.text_detector, solo.text_detector),
        (analyzer.text_recognizer, solo.text_recognizer),
        (analyzer.layout.layout_parser, solo.layout.layout_parser),
        (
            analyzer.layout.table_structure_recognizer,
            solo.layout.table_structure_recognizer,
        ),
    ):
        b.model.params = a.model.params

    rng = np.random.RandomState(11)
    pages = []
    for s in range(3):
        p = np.full((160, 240, 3), 255, np.uint8)
        for _ in range(6):
            x0, y0 = rng.randint(0, 150), rng.randint(0, 120)
            p[y0 : y0 + 18, x0 : x0 + 60] = rng.randint(0, 120, 3)
        pages.append(p)

    results = analyzer._batch_dp_fused(pages)
    assert len(results) == 3

    def _close(a, b):
        if isinstance(a, dict):
            return a.keys() == b.keys() and all(
                _close(a[k], b[k]) for k in a
            )
        if isinstance(a, (list, tuple)):
            return len(a) == len(b) and all(
                _close(x, y) for x, y in zip(a, b)
            )
        if isinstance(a, float) or isinstance(b, float):
            return abs(float(a) - float(b)) <= 2.0 / 255.0
        return a == b

    for i, (res, _, _) in enumerate(results):
        want = solo(pages[i])[0].model_dump()
        assert _close(want, res.model_dump()), f"page {i} diverges"
