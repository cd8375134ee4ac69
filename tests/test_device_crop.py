"""Device-side line cropping vs the host cv2 pipeline (perspective warp +
rotate + resize_with_padding)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yomitoku_tpu.ops.device_crop import (  # noqa: E402
    line_homographies,
    pad_page,
    sample_lines,
)

OUT = (32, 800)


def _page(h=600, w=900, seed=0):
    rng = np.random.RandomState(seed)
    # smooth-ish content: random blobs + gradients (pure noise overstates
    # resampling-filter differences no real page exhibits)
    page = np.zeros((h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 / w * 0.5 + yy * 255 / h * 0.5).astype(np.uint8)
    page[..., 0] = base
    page[..., 1] = 255 - base
    page[..., 2] = rng.randint(0, 255)
    for _ in range(40):
        x0, y0 = rng.randint(0, w - 60), rng.randint(0, h - 30)
        page[y0 : y0 + 24, x0 : x0 + 56] = rng.randint(0, 255, 3)
    return page


def _host_crops(page, quads):
    from types import SimpleNamespace

    from yomitoku_tpu.data.dataset import ParseqDataset

    cfg = SimpleNamespace(data=SimpleNamespace(img_size=list(OUT)))
    ds = ParseqDataset(cfg, page, quads)
    return ds.as_u8_array().astype(np.float32)


def _device_crops(page, quads):
    mats, valid = line_homographies(quads, OUT)
    padded = pad_page(page, align=64)
    out = jax.jit(sample_lines, static_argnames=("out_hw",))(
        jnp.asarray(padded), jnp.asarray(mats), jnp.asarray(valid), out_hw=OUT
    )
    return np.asarray(out)


def _assert_close(dev, host, mean_tol=6.0, frac_tol=0.02):
    assert dev.shape == host.shape
    diff = np.abs(dev - host)
    assert diff.mean() < mean_tol, diff.mean()
    # at most frac_tol of pixels off by more than 32 levels
    assert (diff > 32).mean() < frac_tol, (diff > 32).mean()


def test_axis_aligned_no_resize():
    page = _page()
    quads = [[[100, 100], [500, 100], [500, 130], [100, 130]]]  # 400x30: fits
    dev = _device_crops(page, quads)
    host = _host_crops(page, quads)
    # no resampling at scale 1 -> near-exact
    assert np.abs(dev - host).mean() < 1.0


def test_axis_aligned_shrink():
    page = _page()
    quads = [[[50, 200], [850, 200], [850, 260], [50, 260]]]  # 800x60 -> shrink
    _assert_close(_device_crops(page, quads), _host_crops(page, quads))


def test_vertical_line_rotation():
    page = _page()
    quads = [[[300, 50], [340, 50], [340, 500], [300, 500]]]  # h >> 2w
    dev = _device_crops(page, quads)
    host = _host_crops(page, quads)
    _assert_close(dev, host)
    # both must place content in the rotated orientation (wide, not tall)
    assert (host[0, :, 500:].sum() > 0) == (dev[0, :, 500:].sum() > 0)


def test_perspective_quad():
    page = _page()
    quads = [[[100, 100], [420, 120], [415, 180], [95, 160]]]
    _assert_close(
        _device_crops(page, quads), _host_crops(page, quads), mean_tol=8.0,
        frac_tol=0.05,
    )


def test_batch_and_padding_mask():
    page = _page()
    quads = [
        [[100, 100], [300, 100], [300, 130], [100, 130]],
        [[10, 10], [60, 10], [60, 40], [10, 40]],
    ]
    dev = _device_crops(page, quads)
    host = _host_crops(page, quads)
    _assert_close(dev, host)
    # padding region beyond each line's fitted extent is exactly zero
    mats, valid = line_homographies(quads, OUT)
    for i in range(len(quads)):
        nw, nh = valid[i]
        assert dev[i, :, nw:].sum() == 0
        assert dev[i, nh:, :].sum() == 0


def test_page_padding_alignment():
    page = _page(h=601, w=899)
    padded = pad_page(page, align=512)
    assert padded.shape[0] % 512 == 0 and padded.shape[1] % 512 == 0
    assert (padded[:601, :899] == page).all()
    assert padded[601:].sum() == 0


def test_staged_page_mat_cached_and_correct():
    """staged_page_mat returns the SAME committed device buffer for a
    repeated (page_hw, out_hw) key (the cache exists to avoid re-paying
    a tunnel transfer per dispatch) and its values match region_mats."""
    import numpy as np

    from yomitoku_tpu.ops.device_crop import (
        region_mats,
        staged_page_mat,
        staged_wh,
    )

    a = staged_page_mat((960, 1280), (960, 1280))
    b = staged_page_mat((960, 1280), (960, 1280))
    assert a is b
    ref, _ = region_mats([(0, 0, 1280, 960)], (960, 1280))
    np.testing.assert_allclose(np.asarray(a), ref)

    wh = staged_wh(1280, 960)
    assert wh is staged_wh(1280, 960)
    np.testing.assert_allclose(np.asarray(wh), [[1280.0, 960.0]])
