"""From-page device paths: region resize parity vs cv2 INTER_AREA, and
fused page programs vs the same model fed device-sampled crops directly
(plumbing must be exact; only the resampling filter differs from cv2)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow
import jax.numpy as jnp  # noqa: E402

from yomitoku_tpu.config import structured  # noqa: E402
from yomitoku_tpu.ops.device_crop import (  # noqa: E402
    DevicePage,
    pad_page,
    region_mats,
    sample_lines,
)


def _page(h=500, w=700, seed=1):
    rng = np.random.RandomState(seed)
    page = np.zeros((h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    page[..., 0] = (xx * 255 / w).astype(np.uint8)
    page[..., 1] = (yy * 255 / h).astype(np.uint8)
    for _ in range(30):
        x0, y0 = rng.randint(0, w - 80), rng.randint(0, h - 40)
        page[y0 : y0 + 32, x0 : x0 + 72] = rng.randint(0, 255, 3)
    return page


def test_region_resize_matches_cv2_inter_area():
    import cv2

    page = _page()
    regions = [(0, 0, 700, 500), (100, 50, 420, 380)]
    out_hw = (160, 160)
    mats, valid = region_mats(regions, out_hw)
    dev = np.asarray(
        sample_lines(
            jnp.asarray(pad_page(page, 64)), jnp.asarray(mats),
            jnp.asarray(valid), out_hw=out_hw, flip_bgr=True,
        )
    )
    for i, (x1, y1, x2, y2) in enumerate(regions):
        crop = cv2.cvtColor(page[y1:y2, x1:x2], cv2.COLOR_BGR2RGB)
        host = cv2.resize(
            crop, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA
        ).astype(np.float32)
        diff = np.abs(dev[i] - host)
        assert diff.mean() < 8.0, diff.mean()
        assert (diff > 40).mean() < 0.03


def test_dbnet_from_page_matches_direct_forward():
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.data.functions import IMAGENET_MEAN, IMAGENET_STD
    from yomitoku_tpu.models.dbnet import DBNet

    model = DBNet(structured(TextDetectorDBNetV2_1Config))
    model.params = model.init_params(0)
    page = _page(256, 320)
    padded = pad_page(page, 64)
    out_hw = (128, 160)
    mats, valid = region_mats([(0, 0, 320, 256)], out_hw)

    fused = model.forward_binary_from_page(jnp.asarray(padded), (256, 320), out_hw)

    crops = np.asarray(
        sample_lines(
            jnp.asarray(padded), jnp.asarray(mats), jnp.asarray(valid),
            out_hw=out_hw, flip_bgr=False,
        )
    )
    mean = np.float32(IMAGENET_MEAN) * 255.0
    std = np.float32(IMAGENET_STD) * 255.0
    direct = model.forward_binary(((crops - mean) / std).astype(np.float32))
    # fused path quantizes the map to uint8 for the wire
    np.testing.assert_allclose(fused, direct, atol=1.5 / 255.0)


def test_rtdetr_from_page_matches_direct_forward():
    from yomitoku_tpu.configs import TableStructureRecognizerRTDETRv2Config
    from yomitoku_tpu.models.rtdetr import RTDETRv2

    model = RTDETRv2(structured(TableStructureRecognizerRTDETRv2Config))
    model.params = model.init_params(0)
    page = _page(512, 704)
    padded = pad_page(page, 64)
    out_hw = (640, 640)
    regions = [(30, 20, 500, 380), (200, 100, 690, 500)]
    mats, valid = region_mats(regions, out_hw)

    fused = model.forward_from_page(jnp.asarray(padded), mats, out_hw)

    crops = np.asarray(
        sample_lines(
            jnp.asarray(padded), jnp.asarray(mats), jnp.asarray(valid),
            out_hw=out_hw, flip_bgr=True,
        )
    )
    direct = model.forward((crops / 255.0).astype(np.float32))
    # float-associativity noise can swap near-tied queries in the decoder's
    # top-k selection (random weights make near-ties common), so allow a
    # small fraction of whole-row swaps on top of the numeric tolerance
    for key in ("pred_logits", "pred_boxes"):
        a = np.asarray(fused[key])
        b = np.asarray(direct[key])
        mismatched = np.abs(a - b) > 2e-3 + 2e-3 * np.abs(b)
        assert mismatched.mean() < 0.02, (key, mismatched.mean())


def test_modules_accept_device_page(monkeypatch):
    """Detector/Layout/TSR/recognizer run end-to-end from one shared
    DevicePage on the CPU backend (shapes/schema surface, no weights)."""
    from yomitoku_tpu.layout_analyzer import LayoutAnalyzer
    from yomitoku_tpu.text_detector import TextDetector
    from yomitoku_tpu.text_recognizer import TextRecognizer

    img = _page(480, 640)
    page = DevicePage(img)

    det = TextDetector(device="cpu")
    det_out, _ = det(img, page=page)
    assert hasattr(det_out, "points")

    layout = LayoutAnalyzer(device="cpu")
    lay_out, _ = layout(img, page=page)
    assert hasattr(lay_out, "tables")

    rec = TextRecognizer(model_name="parseq-tiny", device="cpu")
    monkeypatch.setattr(
        TextRecognizer, "_use_device_crops", lambda self: True
    )
    quads = [[[50, 60], [300, 60], [300, 95], [50, 95]]]
    rec_out, _ = rec(img, quads, page=page)
    assert len(rec_out.contents) == 1
