"""sample_regions_separable must match sample_lines exactly (to float
association) on every axis-aligned map shape the pipeline produces."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from yomitoku_tpu.ops.device_crop import region_mats, sample_lines
from yomitoku_tpu.ops.separable_resize import sample_regions_separable


def _page(h=96, w=128, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)


def _compare(page, regions, out_hw, supersample=True, flip_bgr=True):
    mats, valid = region_mats(regions, out_hw)
    dpage = jnp.asarray(page)
    ref = np.asarray(
        sample_lines(
            dpage, jnp.asarray(mats), jnp.asarray(valid), out_hw=out_hw,
            flip_bgr=flip_bgr, supersample=supersample,
        )
    )
    got = np.asarray(
        sample_regions_separable(
            dpage, jnp.asarray(mats), out_hw, flip_bgr=flip_bgr,
            supersample=supersample,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_full_page_resize_matches_gather():
    # detector-style: whole page to a different (downscaled) grid
    _compare(_page(96, 128), [(0, 0, 128, 96)], (64, 96), flip_bgr=False)


def test_upscale_and_identity():
    _compare(_page(48, 64), [(0, 0, 64, 48)], (48, 64))   # identity scale
    _compare(_page(48, 64), [(0, 0, 64, 48)], (96, 128))  # 2x upscale


def test_table_crops_match_gather():
    # TSR-style: several interior boxes to a fixed square
    regions = [(3, 5, 70, 40), (10, 10, 120, 90), (0, 0, 33, 21)]
    _compare(_page(96, 128), regions, (32, 32))


def test_border_clamp_and_degenerate():
    # region touching/exceeding borders exercises the clamped tent;
    # the 1x1 degenerate slot is the fused program's padding crop
    regions = [(0, 0, 128, 96), (100, 80, 128, 96), (0, 0, 1, 1)]
    _compare(_page(96, 128), regions, (16, 16))


def test_single_tap_mode():
    _compare(_page(64, 64), [(2, 2, 60, 60)], (24, 24), supersample=False)


def test_chunked_many_regions():
    # B=8 with chunk=4 exercises the lax.map path
    rng = np.random.RandomState(3)
    regions = []
    for _ in range(8):
        x1, y1 = rng.randint(0, 60, 2)
        regions.append((x1, y1, x1 + rng.randint(4, 60), y1 + rng.randint(4, 30)))
    _compare(_page(96, 128), regions, (16, 24))


def _line_compare(quads, out_hw=(32, 96), rot180=False, seed=1):
    from yomitoku_tpu.ops.device_crop import line_homographies
    from yomitoku_tpu.ops.separable_resize import (
        mats_separable,
        sample_lines_separable,
    )

    page = _page(96, 128, seed)
    mats, valid = line_homographies(quads, out_hw, rot180=rot180)
    assert mats_separable(mats)
    dpage = jnp.asarray(page)
    ref = np.asarray(
        sample_lines(
            dpage, jnp.asarray(mats), jnp.asarray(valid), out_hw=out_hw
        )
    )
    got = np.asarray(
        sample_lines_separable(
            dpage, jnp.asarray(mats), jnp.asarray(valid), out_hw=out_hw
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-3)


def _rect(x1, y1, x2, y2):
    return [[x1, y1], [x2, y1], [x2, y2], [x1, y2]]


def test_lines_horizontal():
    _line_compare([_rect(4, 8, 90, 26), _rect(10, 40, 120, 56)])


def test_lines_vertical_rotated():
    # tall quads trigger the 90-degree rotation (anti-aligned maps)
    _line_compare([_rect(10, 4, 26, 90), _rect(60, 10, 74, 88)])


def test_lines_mixed_orientations_and_180():
    quads = [_rect(4, 8, 90, 26), _rect(10, 4, 26, 90), _rect(30, 60, 110, 80)]
    _line_compare(quads)
    _line_compare(quads, rot180=True)


def test_lines_chunked_batch():
    quads = [_rect(2 + 7 * i, 3, 50 + 7 * i, 17) for i in range(16)]
    _line_compare(quads)


def test_mats_separable_rejects_rotated_quads():
    from yomitoku_tpu.ops.device_crop import line_homographies
    from yomitoku_tpu.ops.separable_resize import mats_separable

    # genuinely rotated quad (30-degree minAreaRect)
    import math

    c, s = math.cos(0.5), math.sin(0.5)
    base = np.array(_rect(-40, -8, 40, 8), np.float64)
    rot = base @ np.array([[c, s], [-s, c]]) + 64
    mats, _ = line_homographies([rot.tolist()], (32, 96))
    assert not mats_separable(mats)


def test_bucket_padding_keeps_batch_separable():
    """Identity-mat bucket padding (text_recognizer._infer_padded_page)
    must not kick the batch off the separable program — zero-mat padding
    regressed this (degenerate bottom row fails mats_separable)."""
    from yomitoku_tpu.ops.device_crop import line_homographies
    from yomitoku_tpu.ops.separable_resize import (
        mats_separable,
        sample_lines_separable,
    )

    mats, valid = line_homographies([_rect(4, 8, 90, 26)], (32, 96))
    pad = 7
    padded_mats = np.concatenate(
        [mats, np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))]
    )
    padded_valid = np.concatenate([valid, np.zeros((pad, 2), np.int32)])
    assert mats_separable(padded_mats)

    page = _page(96, 128)
    out = np.asarray(
        sample_lines_separable(
            jnp.asarray(page), jnp.asarray(padded_mats),
            jnp.asarray(padded_valid), out_hw=(32, 96),
        )
    )
    # padded lanes are fully masked to black
    assert out[1:].sum() == 0
    ref = np.asarray(
        sample_lines(
            jnp.asarray(page), jnp.asarray(mats), jnp.asarray(valid),
            out_hw=(32, 96),
        )
    )
    np.testing.assert_allclose(out[:1], ref, atol=2e-3)


def test_chunk_remainder_regions():
    # B=7 with chunk=4: 4 via lax.map + 3-tail; must match unchunked
    rng = np.random.RandomState(5)
    regions = []
    for _ in range(7):
        x1, y1 = rng.randint(0, 60, 2)
        regions.append((x1, y1, x1 + rng.randint(4, 60), y1 + rng.randint(4, 30)))
    _compare(_page(96, 128), regions, (16, 24))


def test_chunk_remainder_lines():
    quads = [_rect(2 + 6 * i, 3 + 2 * i, 50 + 6 * i, 17 + 2 * i) for i in range(11)]
    _line_compare(quads)
