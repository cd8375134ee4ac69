import numpy as np
import pytest

from yomitoku_tpu.data import (
    extract_roi_with_perspective,
    load_image,
    load_pdf,
    resize_shortest_edge,
    resize_with_padding,
    rotate_text_image,
    standardization_image,
    array_to_nhwc,
    validate_quads,
)


def test_load_image_png(data_dir):
    pages = load_image(str(data_dir / "test.png"))
    assert len(pages) == 1
    assert pages[0].ndim == 3 and pages[0].shape[2] == 3
    assert pages[0].dtype == np.uint8


def test_load_image_bmp(data_dir):
    assert len(load_image(str(data_dir / "test.bmp"))) == 1


def test_load_image_multi_page_tiff(data_dir):
    pages = load_image(str(data_dir / "test.tiff"))
    assert len(pages) >= 1


def test_load_image_rgba(data_dir):
    pages = load_image(str(data_dir / "rgba.png"))
    assert pages[0].shape[2] == 3


def test_load_image_gray(data_dir):
    pages = load_image(str(data_dir / "test_gray.jpg"))
    assert pages[0].shape[2] == 3


def test_load_image_errors(data_dir):
    with pytest.raises(FileNotFoundError):
        load_image("/no/such/file.png")
    with pytest.raises(ValueError):
        load_image(str(data_dir / "test.txt"))
    with pytest.raises(ValueError):
        load_image(str(data_dir / "test.pdf"))
    with pytest.raises(ValueError):
        load_image(str(data_dir / "invalid.jpg"))
    with pytest.raises(ValueError):
        load_image(str(data_dir / "small.jpg"))


def test_load_pdf_pages(data_dir):
    it = load_pdf(str(data_dir / "test.pdf"))
    assert len(it) == 2


def test_load_pdf_errors(data_dir):
    with pytest.raises(FileNotFoundError):
        load_pdf("/no/such/file.pdf")
    with pytest.raises(ValueError):
        load_pdf(str(data_dir / "test.png"))
    with pytest.raises(ValueError):
        load_pdf(str(data_dir / "invalid.pdf"))


def test_resize_shortest_edge_aligned():
    img = np.zeros((800, 600, 3), dtype=np.uint8)
    out = resize_shortest_edge(img, 1280, 1600)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert min(out.shape[:2]) >= 1152  # 1280 scaled down by long-side cap, /32 snap


def test_resize_shortest_edge_small():
    img = np.zeros((40, 40, 3), dtype=np.uint8)
    out = resize_shortest_edge(img, 32, 64)
    assert out.shape[0] >= 32 and out.shape[1] >= 32


def test_standardization_image():
    img = np.full((4, 4, 3), 255, dtype=np.uint8)
    out = standardization_image(img)
    assert out.dtype == np.float32
    # BGR->RGB then (1 - mean)/std for each channel
    expected_r = (1.0 - 0.485) / 0.229
    assert np.allclose(out[0, 0, 0], expected_r, atol=1e-5)


def test_array_to_nhwc():
    img = np.zeros((8, 6, 3), dtype=np.float32)
    out = array_to_nhwc(img)
    assert out.shape == (1, 8, 6, 3)


def test_validate_quads():
    img = np.zeros((100, 100, 3), dtype=np.uint8)
    ok = [[0, 0], [10, 0], [10, 10], [0, 10]]
    assert validate_quads(img, ok) is True
    assert validate_quads(img, ok[:3]) is None
    assert validate_quads(img, [[0, 0], [10, 0], [10, 10], [0, 200]]) is None
    assert validate_quads(img, [[-5, 0], [10, 0], [10, 10], [0, 10]]) is None


def test_extract_roi_with_perspective():
    img = np.zeros((100, 100, 3), dtype=np.uint8)
    img[20:40, 10:60] = 255
    quad = [[10, 20], [60, 20], [60, 40], [10, 40]]
    roi = extract_roi_with_perspective(img, quad)
    assert roi.shape[0] == 20 and roi.shape[1] == 50
    assert roi.mean() > 250


def test_rotate_text_image():
    tall = np.zeros((100, 20, 3), dtype=np.uint8)
    assert rotate_text_image(tall).shape[:2] == (20, 100)
    wide = np.zeros((20, 100, 3), dtype=np.uint8)
    assert rotate_text_image(wide).shape[:2] == (20, 100)


def test_resize_with_padding():
    img = np.full((64, 400, 3), 200, dtype=np.uint8)
    out = resize_with_padding(img, (32, 800))
    assert out.shape == (32, 800, 3)
    assert out[:, :200].mean() > 150  # content top-left
    assert out[:, 400:].mean() == 0  # padding


def test_geometry_utils():
    from yomitoku_tpu.utils.misc import (
        calc_iou,
        calc_overlap_ratio,
        is_bottom_adjacent,
        is_contained,
        is_intersected_horizontal,
        is_right_adjacent,
        quad_to_xyxy,
    )

    a = [0, 0, 100, 100]
    b = [50, 50, 150, 150]
    assert calc_iou(a, a) == 1.0
    assert 0 < calc_iou(a, b) < 1
    ratio, inter = calc_overlap_ratio(a, [25, 25, 75, 75])
    assert ratio == 1.0 and inter == [25, 25, 75, 75]
    assert is_contained(a, [10, 10, 90, 90])
    assert not is_contained(a, [90, 90, 200, 200])
    assert is_intersected_horizontal([0, 0, 10, 10], [20, 2, 30, 12])
    assert quad_to_xyxy([[1, 2], [5, 2], [5, 9], [1, 9]]) == (1, 2, 5, 9)
    # adjacency: two side-by-side boxes
    assert is_right_adjacent([0, 0, 50, 30], [55, 0, 100, 30])
    assert not is_right_adjacent([55, 0, 100, 30], [0, 0, 50, 30])
    assert is_bottom_adjacent([0, 0, 50, 30], [0, 35, 50, 60])
    assert not is_bottom_adjacent([0, 35, 50, 60], [0, 0, 50, 30])


def test_union_find():
    from yomitoku_tpu.utils.union_find import UnionFind

    uf = UnionFind(6)
    uf.union(0, 1)
    uf.union(1, 2)
    uf.union(4, 5)
    assert uf.same(0, 2)
    assert not uf.same(0, 4)
    assert uf.group_size(1) == 3
    gid = uf.group_id()
    assert gid[0] == gid[1] == gid[2]
    assert gid[4] == gid[5] != gid[0]
    assert sorted(map(sorted, uf.groups())) == [[0, 1, 2], [3], [4, 5]]
