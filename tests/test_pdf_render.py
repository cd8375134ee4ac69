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


# ---------------------------------------------------------------- CCITT fax

def _tiff_ccitt_strips(black: np.ndarray, compression: str) -> bytes:
    """Encode a bool black-mask with PIL/libtiff (independent encoder) and
    return the raw CCITT strip bytes with CCITT-black == mask-True.

    libtiff writes photometric=MinIsBlack for PIL '1' images, under which
    the CCITT-semantic black runs encode the *white* image pixels — so the
    array is inverted before encoding (verified empirically both ways)."""
    import io

    from PIL import Image

    img = Image.fromarray(black.astype(np.uint8) * 255).convert("1")
    buf = io.BytesIO()
    img.save(buf, format="TIFF", compression=compression)
    data = buf.getvalue()
    im = Image.open(io.BytesIO(data))
    offs, counts = im.tag_v2[273], im.tag_v2[279]
    assert im.tag_v2[262] == 1  # MinIsBlack, the polarity documented above
    assert len(offs) == 1, "test images must be single-strip"
    return data[offs[0] : offs[0] + counts[0]]


def _fax_test_image():
    rng = np.random.RandomState(7)
    black = np.zeros((72, 96), bool)
    black[8:16, 10:86] = True  # text-line-ish bar
    black[24:64:4, ::3] = True  # dense texture
    black |= rng.rand(72, 96) > 0.97  # speckle
    return black


@pytest.mark.parametrize("compression,k", [("group4", -1), ("group3", 0)])
def test_ccitt_decode_roundtrip_vs_libtiff(compression, k):
    from yomitoku_tpu.native import ccitt_decode

    black = _fax_test_image()
    data = _tiff_ccitt_strips(black, compression)
    dec = ccitt_decode(data, black.shape[1], black.shape[0], k=k)
    assert np.array_equal(dec == 1, black)


def test_ccitt_decode_all_makeup_codes():
    """Every run length 0..2999 (terminating + makeup + extended makeup)."""
    from yomitoku_tpu.native import ccitt_decode

    black = np.zeros((3000, 3000), bool)
    for i in range(3000):
        black[i, :i] = True
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(black.astype(np.uint8) * 255).convert("1").save(
        buf, format="TIFF", compression="group4"
    )
    data = buf.getvalue()
    im = Image.open(io.BytesIO(data))
    rows = []
    rps = int(im.tag_v2[278])
    for i, (o, c) in enumerate(zip(im.tag_v2[273], im.tag_v2[279])):
        n = min(rps, 3000 - i * rps)
        rows.append(ccitt_decode(data[o : o + c], 3000, n, k=-1))
    assert np.array_equal(np.concatenate(rows, 0) == 1, black)


def test_ccitt_decode_truncated_stream_is_loud_and_white():
    from yomitoku_tpu.native import ccitt_decode

    black = _fax_test_image()
    data = _tiff_ccitt_strips(black, "group4")
    dec = ccitt_decode(data[: len(data) // 4], black.shape[1], black.shape[0], k=-1)
    assert dec.shape == black.shape
    assert not dec[-1].any()  # undecoded tail stays white


def _build_pdf(path, image_dict: str, image_data: bytes, w: int, h: int,
               content: str = None, extra_stream_objects=()):
    """extra_stream_objects: raw stream payloads appended as objects 6, 7, …
    (e.g. a /JBIG2Globals stream referenced as "6 0 R" from image_dict)."""
    if content is None:
        content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q"
    content_b = content.encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            f"/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>"
        ).encode(),
        image_dict.encode() + b"\nstream\n" + image_data + b"\nendstream",
        f"<< /Length {len(content_b)} >>".encode()
        + b"\nstream\n" + content_b + b"\nendstream",
    ]
    for data in extra_stream_objects:
        objs.append(
            f"<< /Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref}\n%%EOF\n"
    ).encode()
    path.write_bytes(bytes(out))
    return path


@pytest.mark.parametrize("black_is_1", [False, True])
def test_pdf_ccitt_g4_image_renders(tmp_path, black_is_1):
    from yomitoku_tpu.data import load_pdf

    black = _fax_test_image()
    h, w = black.shape
    # PDF semantics: BlackIs1 false -> sample 0 = black = CCITT-black runs.
    data = _tiff_ccitt_strips(black, "group4")
    parms = (
        f"<< /K -1 /Columns {w} /Rows {h} "
        f"/BlackIs1 {'true' if black_is_1 else 'false'} >>"
    )
    img_dict = (
        f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
        f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        f"/Filter /CCITTFaxDecode /DecodeParms {parms} /Length {len(data)} >>"
    )
    pdf = _build_pdf(tmp_path / "fax.pdf", img_dict, data, w, h)
    page = load_pdf(pdf, dpi=72)[0]
    assert page.shape == (h, w, 3)
    got_black = page.mean(axis=2) < 128
    want = ~black if black_is_1 else black  # BlackIs1 flips sample meaning
    agreement = (got_black == want).mean()
    assert agreement > 0.98, agreement


def test_pdf_ccitt_imagemask_stencil(tmp_path):
    from yomitoku_tpu.data import load_pdf

    black = _fax_test_image()
    h, w = black.shape
    data = _tiff_ccitt_strips(black, "group4")
    img_dict = (
        f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
        f"/ImageMask true /BitsPerComponent 1 "
        f"/Filter /CCITTFaxDecode "
        f"/DecodeParms << /K -1 /Columns {w} /Rows {h} >> /Length {len(data)} >>"
    )
    content = f"q 1 0 0 rg {w} 0 0 {h} 0 0 cm /Im0 Do Q"  # red fill
    pdf = _build_pdf(tmp_path / "mask.pdf", img_dict, data, w, h, content)
    page = load_pdf(pdf, dpi=72)[0]  # BGR
    painted = (page[..., 2] > 128) & (page[..., 0] < 128)
    assert (painted == black).mean() > 0.98


def test_pdf_jbig2_image_blank_and_loud(tmp_path, caplog):
    import logging

    from yomitoku_tpu.data import load_pdf

    img_dict = (
        "<< /Type /XObject /Subtype /Image /Width 40 /Height 30 "
        "/ColorSpace /DeviceGray /BitsPerComponent 1 "
        "/Filter /JBIG2Decode /Length 8 >>"
    )
    pdf = _build_pdf(tmp_path / "jbig2.pdf", img_dict, b"\x00" * 8, 40, 30)
    # set_logger disables propagation, so capture via a handler on the module
    # logger rather than caplog's root handler.
    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record)

    render_logger = logging.getLogger("yomitoku_tpu.data.pdf.render")
    handler = _Catch()
    render_logger.addHandler(handler)
    try:
        page = load_pdf(pdf, dpi=72)[0]
    finally:
        render_logger.removeHandler(handler)
    assert (page > 240).all()  # blank, not garbage pixels
    assert any("JBIG2" in r.getMessage() for r in records)


def test_pdf_jpx_image_renders(tmp_path):
    import io

    from PIL import Image

    from yomitoku_tpu.data import load_pdf

    rgb = np.zeros((32, 48, 3), np.uint8)
    rgb[:16, :, 0] = 220  # top half red
    rgb[16:, :, 2] = 220  # bottom half blue
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG2000")
    data = buf.getvalue()
    img_dict = (
        "<< /Type /XObject /Subtype /Image /Width 48 /Height 32 "
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 "
        f"/Filter /JPXDecode /Length {len(data)} >>"
    )
    pdf = _build_pdf(tmp_path / "jpx.pdf", img_dict, data, 48, 32)
    page = load_pdf(pdf, dpi=72)[0]  # BGR
    assert page[8, 24, 2] > 150 and page[8, 24, 0] < 100  # red on top
    assert page[24, 24, 0] > 150 and page[24, 24, 2] < 100  # blue below


# ---------------------------------------------------------------- shadings

def _build_shading_pdf(path, shading: str, content: str, w=100, h=60,
                       extra_res: str = ""):
    content_b = content.encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            f"/Resources << /Shading << /Sh0 4 0 R >> {extra_res} >> "
            f"/Contents 5 0 R >>"
        ).encode(),
        shading.encode(),
        f"<< /Length {len(content_b)} >>".encode()
        + b"\nstream\n" + content_b + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref}\n%%EOF\n"
    ).encode()
    path.write_bytes(bytes(out))
    return path


def test_pdf_axial_shading_paints_average_color(tmp_path):
    from yomitoku_tpu.data import load_pdf

    shading = (
        "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 100 0] "
        "/Function << /FunctionType 2 /Domain [0 1] "
        "/C0 [1 0 0] /C1 [0 0 1] /N 1 >> >>"
    )
    # clip to the left half, then sh
    content = "q 0 0 50 60 re W n /Sh0 sh Q"
    pdf = _build_shading_pdf(tmp_path / "axial.pdf", shading, content)
    page = load_pdf(pdf, dpi=72)[0]  # BGR
    px = page[30, 25]  # inside the clip: average of red and blue
    assert abs(int(px[0]) - 128) < 30 and abs(int(px[2]) - 128) < 30
    assert px[1] < 60
    outside = page[30, 75]  # outside the clip stays white
    assert (outside > 240).all()


def test_pdf_stitching_function_shading(tmp_path):
    from yomitoku_tpu.data import load_pdf

    # green->green via two stitched exponential halves: average is green
    shading = (
        "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 0 60] "
        "/Function << /FunctionType 3 /Domain [0 1] /Bounds [0.5] "
        "/Encode [0 1 0 1] /Functions ["
        "<< /FunctionType 2 /Domain [0 1] /C0 [0 1 0] /C1 [0 0.5 0] /N 1 >> "
        "<< /FunctionType 2 /Domain [0 1] /C0 [0 0.5 0] /C1 [0 1 0] /N 1 >>"
        "] >> >>"
    )
    content = "q 0 0 100 60 re W n /Sh0 sh Q"
    pdf = _build_shading_pdf(tmp_path / "stitch.pdf", shading, content)
    page = load_pdf(pdf, dpi=72)[0]
    px = page[30, 50]
    assert px[1] > 150 and px[0] < 80 and px[2] < 80  # green-dominant


def test_pdf_shading_pattern_fill(tmp_path):
    from yomitoku_tpu.data import load_pdf

    shading = (
        "<< /ShadingType 2 /ColorSpace /DeviceGray /Coords [0 0 100 0] "
        "/Function << /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [0.4] "
        "/N 1 >> >>"
    )
    extra = "/Pattern << /P0 << /PatternType 2 /Shading 4 0 R >> >>"
    content = "/Pattern cs /P0 scn 10 10 80 40 re f"
    pdf = _build_shading_pdf(
        tmp_path / "pat.pdf", shading, content, extra_res=extra
    )
    page = load_pdf(pdf, dpi=72)[0]
    px = page[30, 50]
    assert abs(int(px.mean()) - 51) < 25  # avg gray 0.2 -> ~51
    assert (page[5, 5] > 240).all()  # outside the rect


def test_pdf_tiling_pattern_fill_average_color(tmp_path):
    """Colored tiling pattern: cell half-covered in red -> pink-ish flat
    fill (average of red ink and white background), not a hole."""
    from yomitoku_tpu.data import load_pdf

    cell = "1 0 0 rg 0 0 10 5 re f"
    pattern = (
        "<< /PatternType 1 /PaintType 1 /TilingType 1 "
        "/BBox [0 0 10 10] /XStep 10 /YStep 10 "
        f"/Resources << >> /Length {len(cell)} >>\n"
        f"stream\n{cell}\nendstream"
    )
    extra = "/Pattern << /P0 4 0 R >>"
    content = "/Pattern cs /P0 scn 10 10 80 40 re f"
    pdf = _build_shading_pdf(
        tmp_path / "tile.pdf", pattern, content, extra_res=extra
    )
    page = load_pdf(pdf, dpi=72)[0]  # BGR
    px = page[30, 50]
    assert int(px[2]) > 200          # red channel near full
    assert 90 < int(px[0]) < 170     # blue/green ~half (white mixed in)
    assert 90 < int(px[1]) < 170
    assert (page[5, 5] > 240).all()  # outside the rect stays white


def test_pdf_uncolored_tiling_pattern_uses_fill_color(tmp_path):
    """PaintType 2 (stencil) tiling: cell coverage colours with the scn
    colour components."""
    from yomitoku_tpu.data import load_pdf

    cell = "0 0 10 5 re f"  # half the cell, painted in the under colour
    pattern = (
        "<< /PatternType 1 /PaintType 2 /TilingType 1 "
        "/BBox [0 0 10 10] /XStep 10 /YStep 10 "
        f"/Resources << >> /Length {len(cell)} >>\n"
        f"stream\n{cell}\nendstream"
    )
    extra = "/Pattern << /P0 4 0 R >>"
    content = "/Pattern cs 0 0 1 /P0 scn 10 10 80 40 re f"  # blue under
    pdf = _build_shading_pdf(
        tmp_path / "tile2.pdf", pattern, content, extra_res=extra
    )
    page = load_pdf(pdf, dpi=72)[0]  # BGR
    px = page[30, 50]
    assert int(px[0]) > 200          # blue stays full
    assert 90 < int(px[2]) < 170     # red ~half: white+blue mix


@pytest.mark.parametrize(
    "mutate",
    ["empty", "garbage", "header_only", "truncated_half", "no_trailer"],
)
def test_pdf_corrupt_inputs_fail_clean_or_salvage(tmp_path, mutate):
    """Corrupt inputs either raise the loader's ValueError (like the
    reference's pdfium error path, data/functions.py:96-155) or salvage
    pages via xref reconstruction — never crash with an internal error."""
    from yomitoku_tpu.data import load_pdf

    good = open("/root/reference/tests/data/test.pdf", "rb").read()
    data = {
        "empty": b"",
        "garbage": b"not a pdf at all" * 100,
        "header_only": b"%PDF-1.4\n",
        "truncated_half": good[: len(good) // 2],
        "no_trailer": good.replace(b"trailer", b"trXiler"),
    }[mutate]
    p = tmp_path / f"{mutate}.pdf"
    p.write_bytes(data)
    try:
        pages = load_pdf(str(p))
    except ValueError:
        return  # clean refusal is fine
    # salvage path: whatever loads must rasterize to real page images
    for pg in pages:
        assert pg.ndim == 3 and pg.dtype == np.uint8 and pg.shape[2] == 3


def test_demo_scan_pdf_asset_renders():
    """The committed fax-scan demo asset must keep decoding (guards the
    G4 stream + PDF structure written by scripts/make_demo_assets.py)."""
    import os

    from yomitoku_tpu.data import load_pdf

    path = os.path.join(os.path.dirname(__file__), "..", "demo",
                        "sample_scan.pdf")
    if not os.path.exists(path):
        pytest.skip("demo assets not generated")
    page = load_pdf(path, dpi=72)[0]
    assert page.ndim == 3
    assert (page.mean(axis=2) < 128).sum() > 1000  # the scan's ink
