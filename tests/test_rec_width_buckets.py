"""Opt-in recognizer width buckets (YOMITOKU_TPU_REC_WIDTH_BUCKETS).

The contract: a line whose content fits a narrower canvas is cropped
bit-identically to the left slice of the full-width crop, the ViT slices
its position-embedding grid, and bucketed/full lines merge back in input
order.  The narrow-bucket decode must equal the same model run at that
canvas width directly (the oracle), while wide lines are untouched.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow  # model-forward tests (CPU jit compiles)

import jax.numpy as jnp  # noqa: E402


def _recognizer():
    from yomitoku_tpu.text_recognizer import TextRecognizer

    return TextRecognizer(
        path_cfg="tests/yaml/rec_small.yaml",
        device="cpu",
        from_pretrained=False,
    )


def _page_with_lines():
    rng = np.random.RandomState(5)
    img = np.full((64, 96, 3), 255, np.uint8)
    img[8:18, 4:16] = rng.randint(0, 255, (10, 12, 3))    # narrow (w=12)
    img[30:40, 4:34] = rng.randint(0, 255, (10, 30, 3))   # wide (w=30)
    img[48:58, 40:52] = rng.randint(0, 255, (10, 12, 3))  # narrow again
    quads = [
        [[4, 8], [16, 8], [16, 18], [4, 18]],
        [[4, 30], [34, 30], [34, 40], [4, 40]],
        [[40, 48], [52, 48], [52, 58], [40, 58]],
    ]
    return img, quads


def test_narrow_crop_is_left_slice_of_full_crop():
    from yomitoku_tpu.ops.device_crop import line_homographies, pad_page
    from yomitoku_tpu.ops.separable_resize import sample_lines_separable

    img, quads = _page_with_lines()
    mats, valid_wh = line_homographies(quads[:1], out_hw=(32, 32))
    page = jnp.asarray(pad_page(img))
    full = np.asarray(
        sample_lines_separable(page, mats, valid_wh, out_hw=(32, 32))
    )
    narrow = np.asarray(
        sample_lines_separable(page, mats, valid_wh, out_hw=(32, 16))
    )
    np.testing.assert_array_equal(narrow, full[:, :, :16])


def test_vit_pos_embed_slices_for_narrow_input():
    from yomitoku_tpu.models.layers.vit import ViTEncoder

    enc = ViTEncoder(
        img_size=(32, 32), patch_size=(8, 8), embed_dim=16, depth=1,
        num_heads=2,
    )
    rng = np.random.RandomState(0)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    narrow = jnp.asarray(rng.rand(2, 32, 16, 3), jnp.float32)
    out = enc.apply(params, narrow)
    assert out.shape == (2, (32 // 8) * (16 // 8), 16)
    # the sliced pos-embed is the left column sub-grid of the full one
    pe = params["params"]["pos_embed"].reshape(4, 4, 16)
    x_tokens = enc.apply(params, jnp.zeros((1, 32, 16, 3)))
    assert x_tokens.shape[1] == 8  # 4 rows x 2 cols
    del pe


def test_width_buckets_route_and_match_oracle(monkeypatch):
    monkeypatch.setenv("YOMITOKU_TPU_DEVICE_CROPS", "1")
    img, quads = _page_with_lines()

    rec = _recognizer()
    # baseline: buckets off
    monkeypatch.delenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", raising=False)
    base_preds, base_scores, base_dirs, base_pts = rec._call_device(
        img, quads
    )

    monkeypatch.setenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", "16")
    assert rec._width_buckets() == [16]
    preds, scores, dirs, pts = rec._call_device(img, quads)

    assert len(preds) == len(base_preds) == 3
    assert [p.tolist() if hasattr(p, "tolist") else p for p in pts] == [
        p.tolist() if hasattr(p, "tolist") else p for p in base_pts
    ]
    # wide line (index 1, content w=30 > 16) keeps the full program and
    # must match the unbucketed result exactly
    assert preds[1] == base_preds[1]
    assert scores[1] == pytest.approx(base_scores[1], abs=1e-6)

    # narrow lines must equal the oracle: the model run directly at the
    # 16-px canvas on just those lines
    from yomitoku_tpu.ops.device_crop import line_homographies, pad_page

    mats, valid_wh = line_homographies(
        [quads[0], quads[2]], out_hw=(32, 32)
    )
    page = jnp.asarray(pad_page(img))
    ids, probs = rec.model.forward_tokens_from_page(
        page, mats, valid_wh, out_w=16
    )
    o_preds, o_scores = rec.tokenizer.decode_ids(ids, probs)
    import unicodedata

    o_preds = [unicodedata.normalize("NFKC", p) for p in o_preds]
    assert preds[0] == o_preds[0] and preds[2] == o_preds[1]
    assert scores[0] == pytest.approx(float(o_scores[0]), abs=1e-6)


def test_invalid_bucket_widths_ignored(monkeypatch):
    rec = _recognizer()
    monkeypatch.setenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", "13,0,32,64")
    # 13 not a patch multiple, 0 invalid, 32 == full, 64 > full
    assert rec._width_buckets() is None
    monkeypatch.setenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", "16,8")
    assert rec._width_buckets() == [8, 16]


def test_width_buckets_with_orientation_fallback(monkeypatch):
    """The fallback retry path re-enters the bucket router with rot180
    homographies; results must stay order-aligned and not crash."""
    monkeypatch.setenv("YOMITOKU_TPU_DEVICE_CROPS", "1")
    monkeypatch.setenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", "16")
    from yomitoku_tpu.text_recognizer import TextRecognizer

    rec = TextRecognizer(
        path_cfg="tests/yaml/rec_small.yaml",
        device="cpu",
        from_pretrained=False,
        rec_orientation_fallback=True,
        rec_orientation_fallback_thresh=1.1,  # force retry on every line
    )
    img, quads = _page_with_lines()
    preds, scores, dirs, pts = rec._call_device(img, quads)
    assert len(preds) == len(quads) == len(pts)
    assert all(isinstance(p, str) for p in preds)


def test_width_bucket_env_semantics(monkeypatch):
    rec = _recognizer()
    # rec_small: full canvas 32, patch width 8 -> default half bucket 16
    assert rec._default_width_buckets() == [16]

    # unset -> audited auto state (None here: random weights, no audit ran)
    monkeypatch.delenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", raising=False)
    assert rec._auto_width_buckets is None
    assert rec._width_buckets() is None
    # the audit enables the default through the auto state
    rec._auto_width_buckets = [16]
    assert rec._width_buckets() == [16]

    # explicit disable wins over auto
    for off in ("0", "off", "none", "FALSE"):
        monkeypatch.setenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", off)
        assert rec._width_buckets() is None
    # explicit force (patch-multiple widths under the full canvas)
    monkeypatch.setenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", "8,16")
    assert rec._width_buckets() == [8, 16]
    monkeypatch.setenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", "12,64")
    assert rec._width_buckets() is None  # 12 not a patch multiple, 64 >= 32


def test_width_bucket_audit_gates_on_greedy_parity(monkeypatch):
    """The load-time audit enables the default bucket iff every probe
    string matches between the narrow- and full-canvas programs."""
    rec = _recognizer()
    calls = []

    def agree(page, mats, wh, out_w=None):
        calls.append(out_w)
        n = len(mats)
        ids = np.full((n, 4), 3, np.int64)
        ids[:, -1] = 0  # EOS
        return ids, np.full((n, 4), 0.9, np.float32)

    monkeypatch.setattr(rec.model, "forward_tokens_from_page", agree)
    assert rec.audit_width_buckets() == [16]
    assert calls == [None, 16]  # full canvas then narrow canvas

    def diverge(page, mats, wh, out_w=None):
        n = len(mats)
        fill = 3 if out_w is None else 4
        ids = np.full((n, 4), fill, np.int64)
        ids[:, -1] = 0
        return ids, np.full((n, 4), 0.9, np.float32)

    monkeypatch.setattr(rec.model, "forward_tokens_from_page", diverge)
    assert rec.audit_width_buckets() is None


def test_width_bucket_audit_real_forward(monkeypatch):
    """Drive the audit through the real model programs: probes cover
    horizontal and vertical-rotated aspect ratios, all fitting the
    bucket, and the audit returns a definite verdict without raising.
    (Random weights make the verdict itself seed-dependent; parity on
    real checkpoints is what the audit exists to measure.)"""
    monkeypatch.setenv("YOMITOKU_TPU_DEVICE_CROPS", "1")
    rec = _recognizer()
    out = rec.audit_width_buckets()
    assert out in (None, [16])


def test_router_cost_guard_skips_lossy_split(monkeypatch):
    """A 64/64 narrow/wide mix would pad to 128@16 + 128@32 (1.5x the
    work of one 128@32 dispatch) -- the router must fall back to a single
    full-width dispatch; a cheap split (2 narrow / 1 wide) still routes."""
    monkeypatch.setenv("YOMITOKU_TPU_REC_WIDTH_BUCKETS", "16")
    rec = _recognizer()
    seen = []

    def fake_run(page, mats, valid_wh, points, out_w=None):
        seen.append((len(mats), out_w))
        n = len(mats)
        return ["x"] * n, [0.5] * n, ["horizontal"] * n

    monkeypatch.setattr(rec, "_run_batch_inference_page_w", fake_run)

    mats = np.tile(np.eye(3, dtype=np.float32), (128, 1, 1))
    wh = np.zeros((128, 2), np.int32)
    wh[:64] = (10, 8)   # narrow: fits 16
    wh[64:] = (30, 8)   # wide: full canvas
    pts = [[[0, 0], [1, 0], [1, 1], [0, 1]]] * 128
    rec._run_batch_inference_page(None, mats, wh, pts)
    assert seen == [(128, None)]

    seen.clear()
    rec._run_batch_inference_page(None, mats[:3], wh[62:65], pts[:3])
    # 2 narrow (bucket 8@16) + 1 wide (bucket 1@32) < 8@32 -> split kept
    assert sorted(seen) == [(1, None), (2, 16)]
