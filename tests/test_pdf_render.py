"""Built-in PDF renderer: native rasterizer unit tests + end-to-end page
rasterization of the reference PDFs (CFF CID fonts, TrueType, tables,
images) — the reference gets this from pdfium (data/functions.py:96)."""

import numpy as np
import pytest


def _contour_edges(pts):
    pts = np.asarray(pts, np.float32)
    return np.concatenate([pts, np.roll(pts, -1, axis=0)], axis=1)


def test_rasterizer_rect_exact():
    from yomitoku_tpu.native import fill_edges

    m = fill_edges(_contour_edges([[2, 2], [8, 2], [8, 6], [2, 6]]), 10, 10)
    assert m[3, 4] == 255 and m[0, 0] == 0
    # half-pixel offsets -> exact area antialiasing
    m2 = fill_edges(
        _contour_edges([[2.5, 2.5], [7.5, 2.5], [7.5, 5.5], [2.5, 5.5]]), 10, 10
    )
    assert m2[2, 2] == 64 and m2[2, 3] == 128 and m2[3, 3] == 255


def test_rasterizer_winding_rules():
    from yomitoku_tpu.native import fill_edges

    sq1 = _contour_edges([[1, 1], [6, 1], [6, 6], [1, 6]])
    sq2 = _contour_edges([[4, 4], [9, 4], [9, 9], [4, 9]])
    both = np.concatenate([sq1, sq2])
    assert fill_edges(both, 10, 10, "nonzero")[5, 5] == 255
    assert fill_edges(both, 10, 10, "evenodd")[5, 5] == 0
    # hole via reversed inner contour
    outer = _contour_edges([[1, 1], [9, 1], [9, 9], [1, 9]])
    inner = _contour_edges([[3, 3], [3, 7], [7, 7], [7, 3]])
    ring = fill_edges(np.concatenate([outer, inner]), 10, 10)
    assert ring[5, 5] == 0 and ring[2, 5] == 255


@pytest.mark.parametrize(
    "path,n_pages",
    [
        ("/root/reference/demo/sample.pdf", 10),
        ("/root/reference/tests/data/test.pdf", 2),
    ],
)
def test_load_pdf_page_count(path, n_pages):
    from yomitoku_tpu.data import load_pdf

    pages = load_pdf(path)
    assert len(pages) == n_pages


def test_render_sample_page():
    from yomitoku_tpu.data import load_pdf

    pages = load_pdf("/root/reference/demo/sample.pdf")
    img = pages[0]
    # A4 at 200 dpi
    assert img.shape == (2339, 1654, 3) and img.dtype == np.uint8
    nonwhite = (img < 240).any(axis=2).mean()
    assert 0.03 < nonwhite < 0.6  # text-bearing page, mostly white
    # deterministic
    assert np.array_equal(img, pages[0])


def test_render_test_pdf_has_table_rules():
    from yomitoku_tpu.data import load_pdf

    pages = load_pdf("/root/reference/tests/data/test.pdf")
    img = pages[0]
    gray = img.mean(axis=2)
    dark = gray < 128
    # the table borders produce long horizontal runs of dark pixels
    row_runs = dark.sum(axis=1).max()
    assert row_runs > img.shape[1] * 0.4


def test_pdf_slice_and_negative_indexing():
    from yomitoku_tpu.data import load_pdf

    pages = load_pdf("/root/reference/tests/data/test.pdf")
    sliced = pages[0:2]
    assert len(sliced) == 2
    assert np.array_equal(pages[-1], sliced[1])
