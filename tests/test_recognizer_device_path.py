"""Device-crop recognizer path: the fused crop+decode program must produce
exactly the same tokens as decoding the sampled crops directly, and the
TextRecognizer device path must match the host path's schema surface."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow
import jax.numpy as jnp  # noqa: E402

from yomitoku_tpu.ops.device_crop import (  # noqa: E402
    line_homographies,
    pad_page,
    sample_lines,
)


def _page(h=500, w=700):
    rng = np.random.RandomState(3)
    page = rng.randint(0, 255, (h, w, 3), np.uint8)
    return page


QUADS = [
    [[50, 60], [400, 60], [400, 95], [50, 95]],
    [[100, 150], [130, 150], [130, 420], [100, 420]],  # vertical
    [[200, 200], [600, 210], [598, 250], [198, 240]],  # perspective
]


def test_fused_page_program_matches_direct_decode():
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextRecognizerPARSeqTinyConfig
    from yomitoku_tpu.models.parseq import PARSeq

    model = PARSeq(structured(TextRecognizerPARSeqTinyConfig))
    model.params = model.init_params(0)
    out_hw = tuple(model.core.img_size)

    page = pad_page(_page(), align=64)
    mats, valid = line_homographies(QUADS, out_hw)

    crops = np.asarray(
        sample_lines(jnp.asarray(page), jnp.asarray(mats), jnp.asarray(valid),
                     out_hw=out_hw)
    )
    images = (crops * (1.0 / 127.5) - 1.0).astype(np.float32)
    ids_direct, probs_direct = model.forward_tokens(images)
    ids_fused, probs_fused = model.forward_tokens_from_page(
        jnp.asarray(page), mats, valid
    )
    np.testing.assert_array_equal(ids_fused, ids_direct)
    np.testing.assert_allclose(probs_fused, probs_direct, rtol=1e-5, atol=1e-6)


def test_text_recognizer_device_path_schema(monkeypatch):
    from yomitoku_tpu.text_recognizer import TextRecognizer

    rec = TextRecognizer(model_name="parseq-tiny", device="cpu")
    monkeypatch.setattr(
        TextRecognizer, "_use_device_crops", lambda self: True
    )
    page = _page()
    out = rec(page, QUADS)[0]
    assert len(out.contents) == len(QUADS)
    assert len(out.points) == len(QUADS)
    assert out.directions[0] == "horizontal"
    assert out.directions[1] == "vertical"
    assert all(0.0 <= s <= 1.0 for s in out.scores)


def test_device_path_filters_invalid_quads(monkeypatch):
    from yomitoku_tpu.text_recognizer import TextRecognizer

    rec = TextRecognizer(model_name="parseq-tiny", device="cpu")
    monkeypatch.setattr(
        TextRecognizer, "_use_device_crops", lambda self: True
    )
    page = _page()
    bad = [[[-50, -50], [-10, -50], [-10, -10], [-50, -10]]]  # off-page
    out = rec(page, QUADS + bad)[0]
    assert len(out.contents) == len(QUADS)


def test_device_path_orientation_fallback(monkeypatch):
    from yomitoku_tpu.text_recognizer import TextRecognizer

    rec = TextRecognizer(
        model_name="parseq-tiny", device="cpu",
        rec_orientation_fallback=True, rec_orientation_fallback_thresh=1.1,
    )
    monkeypatch.setattr(
        TextRecognizer, "_use_device_crops", lambda self: True
    )
    # threshold > 1 forces a retry of every line; must not crash and must
    # keep the output surface intact
    out = rec(_page(), QUADS)[0]
    assert len(out.contents) == len(QUADS)


def test_mixed_rotated_batch_partition(monkeypatch):
    """One skewed quad in an otherwise axis-aligned batch must not change
    results vs running the lines in any other composition — the
    recognizer partitions the batch between the separable and gather
    crop programs and merges per-line results back in input order."""
    from yomitoku_tpu.text_recognizer import TextRecognizer

    rec = TextRecognizer(model_name="parseq-tiny", device="cpu")
    monkeypatch.setattr(
        TextRecognizer, "_use_device_crops", lambda self: True
    )
    img = _page()
    # two aligned, one vertical (anti-aligned), one skewed (gather)
    quads = [
        [[50, 60], [400, 60], [400, 95], [50, 95]],
        [[100, 150], [130, 150], [130, 420], [100, 420]],
        [[200, 200], [600, 210], [598, 250], [198, 240]],
        [[60, 300], [420, 300], [420, 340], [60, 340]],
    ]
    res_mixed = rec(img, points=quads)
    # per-line decodes are batch-independent: singleton runs are the oracle
    for i, q in enumerate(quads):
        res_one = rec(img, points=[q])
        assert res_mixed[0].contents[i] == res_one[0].contents[0]
        np.testing.assert_allclose(
            res_mixed[0].scores[i], res_one[0].scores[0], rtol=1e-4
        )
        assert res_mixed[0].directions[i] == res_one[0].directions[0]
