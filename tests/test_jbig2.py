"""JBIG2 decoder (native/jbig2.cpp) tests.

The round-trip oracle is tests/jbig2_ref.py — an independent from-spec
encoder (MQ coder + integer procedures + segment assembly).  The MMR path is
additionally pinned against libtiff's Group-4 encoder (a real external
implementation), mirroring the CCITT tests.
"""

import numpy as np
import pytest

from jbig2_ref import (
    generic_region_segment,
    page_info_segment,
    symbol_dict_segment,
    text_region_segment,
)


def _blob_bitmap(h, w, seed=0):
    """Text-like bitonal test image: strokes and speckles, 1 = black."""
    r = np.random.RandomState(seed)
    bm = np.zeros((h, w), np.uint8)
    for _ in range(max(3, h * w // 300)):
        y0, x0 = r.randint(0, h), r.randint(0, w)
        bh, bw = r.randint(1, 4), r.randint(2, 9)
        bm[y0 : y0 + bh, x0 : x0 + bw] = 1
    return bm


def _decode(stream, w, h, globals_data=b""):
    from yomitoku_tpu.native import jbig2_decode

    return jbig2_decode(stream, w, h, globals_data=globals_data)


@pytest.mark.parametrize("tmpl", [0, 1, 2, 3])
def test_generic_region_roundtrip_templates(tmpl):
    bm = _blob_bitmap(40, 61, seed=tmpl)
    stream = page_info_segment(1, 61, 40) + generic_region_segment(
        2, bm, tmpl=tmpl
    )
    out = _decode(stream, 61, 40)
    np.testing.assert_array_equal(out, bm)


@pytest.mark.parametrize("tmpl", [0, 2])
def test_generic_region_roundtrip_tpgdon(tmpl):
    # rows duplicated on purpose so typical prediction actually triggers
    bm = _blob_bitmap(12, 50, seed=9)
    bm = np.repeat(bm, 3, axis=0)
    stream = page_info_segment(1, 50, 36) + generic_region_segment(
        2, bm, tmpl=tmpl, tpgdon=True
    )
    out = _decode(stream, 50, 36)
    np.testing.assert_array_equal(out, bm)


def test_generic_region_custom_at_pixels():
    bm = _blob_bitmap(30, 44, seed=3)
    at = (2, -1, -2, -1, 1, -2, -1, -2)
    stream = page_info_segment(1, 44, 30) + generic_region_segment(
        2, bm, tmpl=0, at=at
    )
    out = _decode(stream, 44, 30)
    np.testing.assert_array_equal(out, bm)


def test_generic_region_offset_composition():
    bm = _blob_bitmap(10, 20, seed=5)
    stream = page_info_segment(1, 40, 30) + generic_region_segment(
        2, bm, x=15, y=18
    )
    out = _decode(stream, 40, 30)
    np.testing.assert_array_equal(out[18:28, 15:35], bm)
    assert out[:18].sum() == 0 and out[:, :15].sum() == 0


def test_generic_region_mmr_via_libtiff():
    from test_pdf_render import _tiff_ccitt_strips

    bm = _blob_bitmap(48, 64, seed=7)
    g4 = _tiff_ccitt_strips(bm, "group4")
    stream = page_info_segment(1, 64, 48) + generic_region_segment(
        2, bm, mmr_data=g4
    )
    out = _decode(stream, 64, 48)
    np.testing.assert_array_equal(out, bm)


def _glyphs():
    """Distinct small symbol bitmaps grouped by height."""
    a = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], np.uint8)
    b = np.array([[0, 1, 0, 0], [1, 1, 1, 1], [0, 1, 0, 0]], np.uint8)
    c = np.array(
        [[1, 0, 0, 0, 1], [0, 1, 0, 1, 0], [0, 0, 1, 0, 0], [0, 1, 0, 1, 0]],
        np.uint8,
    )
    return [a, b, c]


def test_symbol_dict_text_region_roundtrip():
    syms = _glyphs()
    instances = [(0, 2, 1), (1, 8, 1), (2, 15, 1), (1, 2, 8), (0, 10, 9)]
    w, h = 26, 16
    stream = (
        page_info_segment(1, w, h)
        + symbol_dict_segment(2, syms)
        + text_region_segment(3, 2, w, h, instances, syms)
    )
    out = _decode(stream, w, h)
    want = np.zeros((h, w), np.uint8)
    for sid, x, y in instances:
        s = syms[sid]
        want[y : y + s.shape[0], x : x + s.shape[1]] |= s
    np.testing.assert_array_equal(out, want)


def test_symbol_dict_in_globals_stream():
    syms = _glyphs()
    instances = [(2, 1, 2), (0, 9, 2)]
    w, h = 18, 10
    globals_data = symbol_dict_segment(2, syms)
    stream = page_info_segment(1, w, h) + text_region_segment(
        3, 2, w, h, instances, syms
    )
    out = _decode(stream, w, h, globals_data=globals_data)
    want = np.zeros((h, w), np.uint8)
    for sid, x, y in instances:
        s = syms[sid]
        want[y : y + s.shape[0], x : x + s.shape[1]] |= s
    np.testing.assert_array_equal(out, want)


def test_single_symbol_dictionary():
    # SBSYMCODELEN floors at 1 bit for a one-symbol dictionary
    syms = [_glyphs()[0]]
    instances = [(0, 1, 1), (0, 6, 1)]
    stream = (
        page_info_segment(1, 12, 6)
        + symbol_dict_segment(2, syms)
        + text_region_segment(3, 2, 12, 6, instances, syms)
    )
    out = _decode(stream, 12, 6)
    assert out[1:4, 1:4].sum() == 8 and out[1:4, 6:9].sum() == 8


def test_unsupported_huffman_refagg_fails_loudly():
    # SDHUFF + SDREFAGG is the one Huffman dictionary mode left out (no
    # known encoder emits it) — it must fail loudly, not guess.
    body = (3).to_bytes(2, "big")  # SDHUFF=1, SDREFAGG=1
    from jbig2_ref import segment_header

    stream = page_info_segment(1, 8, 8) + segment_header(
        2, 0, length=len(body)
    ) + body
    with pytest.raises(ValueError, match="refinement"):
        _decode(stream, 8, 8)


def test_corrupt_stream_fails_loudly():
    with pytest.raises(ValueError):
        _decode(b"\x00\x01\x02", 8, 8)


def test_pdf_jbig2_image_renders(tmp_path):
    """End-to-end: a PDF whose image is a JBIG2 generic region renders."""
    from test_pdf_render import _build_pdf

    from yomitoku_tpu.data.pdf import load_pdf

    bm = _blob_bitmap(60, 80, seed=11)
    stream = page_info_segment(1, 80, 60) + generic_region_segment(2, bm)
    path = tmp_path / "jbig2.pdf"
    _build_pdf(
        path,
        "<< /Type /XObject /Subtype /Image /Width 80 /Height 60 "
        "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode "
        f"/Length {len(stream)} >>",
        stream,
        80,
        60,
    )
    pages = load_pdf(str(path), dpi=72)
    img = pages[0]
    # rendered page: black where bm == 1 (BGR image, white background)
    gray = img.mean(axis=2)
    scale_y, scale_x = gray.shape[0] / 60, gray.shape[1] / 80
    black_frac_inside = []
    ys, xs = np.nonzero(bm)
    for y, x in zip(ys[:50], xs[:50]):
        py, px = int((y + 0.5) * scale_y), int((x + 0.5) * scale_x)
        black_frac_inside.append(gray[py, px] < 128)
    assert np.mean(black_frac_inside) > 0.8
    assert gray[2, 2] > 200  # background stays white


def test_pdf_jbig2_with_globals(tmp_path):
    from test_pdf_render import _build_pdf

    from yomitoku_tpu.data.pdf import load_pdf

    syms = _glyphs()
    instances = [(0, 10, 10), (1, 30, 10), (2, 50, 10)]
    globals_data = symbol_dict_segment(2, syms)
    stream = page_info_segment(1, 80, 40) + text_region_segment(
        3, 2, 80, 40, instances, syms
    )
    path = tmp_path / "jbig2g.pdf"
    # globals go in a separate stream object referenced by DecodeParms
    _build_pdf(
        path,
        "<< /Type /XObject /Subtype /Image /Width 80 /Height 40 "
        "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode "
        "/DecodeParms << /JBIG2Globals 6 0 R >> "
        f"/Length {len(stream)} >>",
        stream,
        80,
        40,
        extra_stream_objects=[globals_data],
    )
    pages = load_pdf(str(path), dpi=72)
    gray = pages[0].mean(axis=2)
    assert (gray < 128).sum() > 10  # the glyphs made it onto the page


def test_jbig2_mutation_fuzz_never_crashes():
    """Byte-level mutations of a valid stream must decode or raise
    ValueError — never crash or hang (the C++ decoder bounds-checks all
    reads and caps implausible symbol/instance counts)."""
    syms = _glyphs()
    instances = [(0, 2, 1), (1, 8, 1), (2, 15, 1)]
    stream = bytearray(
        page_info_segment(1, 26, 16)
        + symbol_dict_segment(2, syms)
        + text_region_segment(3, 2, 26, 16, instances, syms)
    )
    rng = np.random.RandomState(0)
    for _ in range(300):
        mutated = bytearray(stream)
        for _ in range(rng.randint(1, 4)):
            mutated[rng.randint(len(mutated))] = rng.randint(256)
        try:
            out = _decode(bytes(mutated), 26, 16)
            assert out.shape == (16, 26)
        except ValueError:
            pass  # loud failure is fine


def test_jbig2_truncation_fuzz_never_crashes():
    bm = _blob_bitmap(24, 40, seed=2)
    stream = page_info_segment(1, 40, 24) + generic_region_segment(2, bm)
    for cut in range(0, len(stream), 7):
        try:
            out = _decode(stream[:cut], 40, 24)
            assert out.shape == (24, 40)
        except ValueError:
            pass


@pytest.mark.parametrize("refcorner", [0, 1, 2, 3])
def test_text_region_refcorners(refcorner):
    """All four reference corners place identically for a fixed top-left
    (the encoder converts; the decoder must land the bitmap in the same
    cells)."""
    syms = _glyphs()
    instances = [(0, 2, 2), (2, 9, 5), (1, 16, 1)]
    w, h = 24, 12
    stream = (
        page_info_segment(1, w, h)
        + symbol_dict_segment(2, syms)
        + text_region_segment(3, 2, w, h, instances, syms,
                              refcorner=refcorner)
    )
    out = _decode(stream, w, h)
    want = np.zeros((h, w), np.uint8)
    for sid, x, y in instances:
        s = syms[sid]
        want[y : y + s.shape[0], x : x + s.shape[1]] |= s
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("refcorner", [0, 1, 2, 3])
def test_text_region_transposed(refcorner):
    syms = _glyphs()
    instances = [(0, 2, 1), (1, 2, 8), (2, 12, 3)]  # column-ish layout
    w, h = 20, 14
    stream = (
        page_info_segment(1, w, h)
        + symbol_dict_segment(2, syms)
        + text_region_segment(3, 2, w, h, instances, syms,
                              refcorner=refcorner, transposed=True)
    )
    out = _decode(stream, w, h)
    want = np.zeros((h, w), np.uint8)
    for sid, x, y in instances:
        s = syms[sid]
        want[y : y + s.shape[0], x : x + s.shape[1]] |= s
    np.testing.assert_array_equal(out, want)


def test_text_region_multirow_strips():
    """SBSTRIPS=4: instances at non-multiple T decode via IAIT CURT."""
    syms = _glyphs()
    instances = [(0, 1, 1), (1, 6, 3), (2, 12, 2), (0, 18, 6), (1, 1, 9)]
    w, h = 24, 14
    stream = (
        page_info_segment(1, w, h)
        + symbol_dict_segment(2, syms)
        + text_region_segment(3, 2, w, h, instances, syms, log2strips=2)
    )
    out = _decode(stream, w, h)
    want = np.zeros((h, w), np.uint8)
    for sid, x, y in instances:
        s = syms[sid]
        want[y : y + s.shape[0], x : x + s.shape[1]] |= s
    np.testing.assert_array_equal(out, want)


def test_text_region_ds_offset_and_xor_compose():
    syms = _glyphs()
    instances = [(0, 2, 1), (0, 4, 1)]  # overlapping -> XOR cancels
    w, h = 12, 6
    stream = (
        page_info_segment(1, w, h)
        + symbol_dict_segment(2, syms)
        + text_region_segment(3, 2, w, h, instances, syms,
                              sbcombop=2, dsoffset=3)
    )
    out = _decode(stream, w, h)
    a = syms[0]
    want = np.zeros((h, w), np.uint8)
    want[1 : 1 + a.shape[0], 2 : 2 + a.shape[1]] ^= a
    want[1 : 1 + a.shape[0], 4 : 4 + a.shape[1]] ^= a
    np.testing.assert_array_equal(out, want)


# ---------------------------------------------------------------------------
# Huffman mode (SDHUFF/SBHUFF, T.88 Annex B + 6.5/6.4 Huffman paths).
# The oracle is the independent encoder in jbig2_ref.py.


def _huff_glyphs():
    """Heights strictly ascending (standard DH table B.4 has no zero or
    negative deltas), widths non-descending within a height class (B.2)."""
    a, b, c = _glyphs()
    return [a, b, c]  # heights 3, 3, 4; widths 3, 4 | 5


def _expect(instances, syms, w, h):
    want = np.zeros((h, w), np.uint8)
    for sid, x, y in instances:
        s = syms[sid]
        want[y : y + s.shape[0], x : x + s.shape[1]] |= s
    return want


def test_huffman_symbol_dict_text_region_roundtrip():
    from jbig2_ref import huff_symbol_dict_segment, huff_text_region_segment

    syms = _huff_glyphs()
    instances = [(0, 2, 1), (1, 8, 1), (2, 15, 1), (1, 2, 8), (0, 10, 9)]
    w, h = 26, 16
    stream = (
        page_info_segment(1, w, h)
        + huff_symbol_dict_segment(2, syms)
        + huff_text_region_segment(3, 2, w, h, instances, syms)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect(instances, syms, w, h))


def test_huffman_symbol_dict_mmr_collective_bitmap():
    from jbig2_ref import huff_symbol_dict_segment, huff_text_region_segment
    from test_pdf_render import _tiff_ccitt_strips

    def mmr(bm):
        return _tiff_ccitt_strips(bm, "group4")

    syms = _huff_glyphs()
    instances = [(2, 1, 2), (0, 9, 2), (1, 15, 2)]
    w, h = 22, 9
    stream = (
        page_info_segment(1, w, h)
        + huff_symbol_dict_segment(2, syms, mmr_encode=mmr)
        + huff_text_region_segment(3, 2, w, h, instances, syms)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect(instances, syms, w, h))


def test_huffman_dict_with_arithmetic_text_region():
    """Coding modes are per-segment: a Huffman dictionary's exported symbols
    feed an arithmetic text region unchanged."""
    from jbig2_ref import huff_symbol_dict_segment

    syms = _huff_glyphs()
    instances = [(0, 1, 1), (2, 7, 1)]
    w, h = 14, 7
    stream = (
        page_info_segment(1, w, h)
        + huff_symbol_dict_segment(2, syms)
        + text_region_segment(3, 2, w, h, instances, syms)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect(instances, syms, w, h))


@pytest.mark.parametrize("refcorner", [0, 1, 2, 3])
def test_huffman_text_region_refcorners(refcorner):
    from jbig2_ref import huff_symbol_dict_segment, huff_text_region_segment

    syms = _huff_glyphs()
    instances = [(0, 2, 2), (2, 9, 5), (1, 16, 1)]
    w, h = 24, 12
    stream = (
        page_info_segment(1, w, h)
        + huff_symbol_dict_segment(2, syms)
        + huff_text_region_segment(3, 2, w, h, instances, syms,
                                   refcorner=refcorner)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect(instances, syms, w, h))


@pytest.mark.parametrize("refcorner", [0, 3])
def test_huffman_text_region_transposed(refcorner):
    from jbig2_ref import huff_symbol_dict_segment, huff_text_region_segment

    syms = _huff_glyphs()
    instances = [(0, 2, 1), (1, 2, 8), (2, 12, 3)]
    w, h = 20, 14
    stream = (
        page_info_segment(1, w, h)
        + huff_symbol_dict_segment(2, syms)
        + huff_text_region_segment(3, 2, w, h, instances, syms,
                                   refcorner=refcorner, transposed=True)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect(instances, syms, w, h))


def test_huffman_text_region_multirow_strips():
    """SBSTRIPS=4 in Huffman mode: CURT is a raw 2-bit field per instance."""
    from jbig2_ref import huff_symbol_dict_segment, huff_text_region_segment

    syms = _huff_glyphs()
    instances = [(0, 1, 1), (1, 6, 3), (2, 12, 2), (0, 18, 6), (1, 1, 9)]
    w, h = 24, 14
    stream = (
        page_info_segment(1, w, h)
        + huff_symbol_dict_segment(2, syms)
        + huff_text_region_segment(3, 2, w, h, instances, syms,
                                   log2strips=2)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect(instances, syms, w, h))


def test_huffman_text_region_ds_offset():
    from jbig2_ref import huff_symbol_dict_segment, huff_text_region_segment

    syms = _huff_glyphs()
    instances = [(0, 2, 1), (0, 8, 1), (1, 14, 1)]
    w, h = 20, 6
    stream = (
        page_info_segment(1, w, h)
        + huff_symbol_dict_segment(2, syms)
        + huff_text_region_segment(3, 2, w, h, instances, syms, dsoffset=2)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect(instances, syms, w, h))


def test_huffman_custom_dw_table():
    """A type-53 custom table (selector 3) carries the width deltas —
    including negative ones the standard B.2 table cannot encode."""
    from jbig2_ref import (
        custom_table_lines,
        custom_table_segment,
        huff_symbol_dict_segment,
        huff_text_region_segment,
    )

    a, b, c = _glyphs()
    syms = [b, a, c]  # widths 4 then 3 in the height-3 class: DW = -1
    table_lines = [(2, 4), (3, 0), (3, 0), (1, 0)]  # [-8, 8) + lower/upper/oob
    enc_lines = custom_table_lines(table_lines, low=-8, high=8, oob=True)
    instances = [(0, 1, 1), (1, 7, 1), (2, 12, 1)]
    w, h = 18, 6
    stream = (
        page_info_segment(1, w, h)
        + custom_table_segment(5, table_lines, low=-8, high=8, oob=True)
        + huff_symbol_dict_segment(2, syms, dw_custom=(5, enc_lines))
        + huff_text_region_segment(3, 2, w, h, instances, syms)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect(instances, syms, w, h))


def test_huffman_in_globals_stream():
    from jbig2_ref import huff_symbol_dict_segment, huff_text_region_segment

    syms = _huff_glyphs()
    instances = [(2, 1, 2), (0, 9, 2)]
    w, h = 18, 10
    globals_data = huff_symbol_dict_segment(2, syms)
    stream = page_info_segment(1, w, h) + huff_text_region_segment(
        3, 2, w, h, instances, syms
    )
    out = _decode(stream, w, h, globals_data=globals_data)
    np.testing.assert_array_equal(out, _expect(instances, syms, w, h))


def test_huffman_text_refinement_fails_loudly():
    from jbig2_ref import region_info, segment_header

    body = bytearray(region_info(8, 8, 0, 0, 0))
    body += (3).to_bytes(2, "big")  # SBHUFF=1, SBREFINE=1
    stream = (
        page_info_segment(1, 8, 8)
        + segment_header(3, 6, length=len(body))
        + bytes(body)
    )
    with pytest.raises(ValueError, match="refinement"):
        _decode(stream, 8, 8)


def test_jbig2_huffman_tables_wellformed():
    """Structural invariants of the transcribed Annex B tables: complete
    canonical prefix codes (Kraft sum = 1), contiguous value ranges, and
    lower/upper lines abutting the normal span."""
    from jbig2_ref import STD_TABLES, assign_prefix_codes

    for num, lines in STD_TABLES.items():
        kraft = sum(
            2.0 ** -preflen for preflen, _, _, _ in lines if preflen > 0
        )
        if num == 10:
            # B.10 is the one deliberately incomplete code in Annex B
            # (242/256); pin it exactly so a transcription slip still trips.
            assert kraft == 242 / 256, f"table B.10 Kraft sum {kraft}"
        else:
            assert kraft == 1.0, f"table B.{num} Kraft sum {kraft}"
        codes = assign_prefix_codes(lines)
        seen = set()
        for length, code in codes.values():
            bits = format(code, f"0{length}b")
            for prefix_len in range(1, len(bits)):
                assert bits[:prefix_len] not in seen, f"B.{num} not prefix-free"
            assert bits not in seen
            seen.add(bits)
        normal = sorted(
            (low, rl) for _, rl, low, kind in lines if kind == "" and rl < 32
        )
        for (low1, rl1), (low2, _) in zip(normal, normal[1:]):
            assert low1 + (1 << rl1) == low2, f"B.{num} range gap at {low2}"
        lowers = [low for _, _, low, kind in lines if kind == "lower"]
        uppers = [low for _, rl, low, kind in lines if kind == "" and rl == 32]
        if normal:
            if lowers:
                assert lowers[0] == normal[0][0] - 1, f"B.{num} lower bound"
            if uppers:
                end = normal[-1][0] + (1 << normal[-1][1])
                assert uppers[0] == end, f"B.{num} upper bound"


# ---------------------------------------------------------------------------
# Pattern dictionaries + halftone regions (T.88 6.6/6.7 + Annex C).


def _halftone_patterns(hpw=4, hph=4):
    """Dither-style patterns with increasing ink coverage (gray 0..5)."""
    order = [(1, 1), (3, 3), (1, 3), (3, 1), (0, 0), (2, 2), (0, 2),
             (2, 0), (1, 0), (3, 2), (0, 1), (2, 3), (1, 2), (3, 0),
             (0, 3), (2, 1)]
    pats = []
    for level in range(6):
        p = np.zeros((hph, hpw), np.uint8)
        for y, x in order[: level * 3]:
            p[y % hph, x % hpw] = 1
        pats.append(p)
    return pats


def _expect_halftone(gray, pats, w, h, hgx=0, hgy=0, hrx=None, hry=0):
    hph, hpw = pats[0].shape
    if hrx is None:
        hrx = hpw << 8
    want = np.zeros((h, w), np.uint8)
    for m in range(gray.shape[0]):
        for n in range(gray.shape[1]):
            x = (hgx + m * hry + n * hrx) >> 8
            y = (hgy + m * hrx - n * hry) >> 8
            p = pats[gray[m, n]]
            for yy in range(hph):
                for xx in range(hpw):
                    if 0 <= y + yy < h and 0 <= x + xx < w:
                        want[y + yy, x + xx] |= p[yy, xx]
    return want


def test_halftone_region_roundtrip():
    from jbig2_ref import halftone_region_segment, pattern_dict_segment

    pats = _halftone_patterns()
    rng = np.random.RandomState(4)
    gray = rng.randint(0, len(pats), size=(5, 8))
    w, h = 32, 20
    stream = (
        page_info_segment(1, w, h)
        + pattern_dict_segment(2, pats)
        + halftone_region_segment(3, 2, w, h, gray, pats)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect_halftone(gray, pats, w, h))


@pytest.mark.parametrize("tmpl", [1, 2])
def test_halftone_region_templates(tmpl):
    from jbig2_ref import halftone_region_segment, pattern_dict_segment

    pats = _halftone_patterns()
    rng = np.random.RandomState(7)
    gray = rng.randint(0, len(pats), size=(4, 6))
    w, h = 24, 16
    stream = (
        page_info_segment(1, w, h)
        + pattern_dict_segment(2, pats, tmpl=tmpl)
        + halftone_region_segment(3, 2, w, h, gray, pats, tmpl=tmpl)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect_halftone(gray, pats, w, h))


def test_halftone_region_skewed_grid_and_skip():
    """A rotated grid (hry != 0) pushes some cells off the region; with
    HENABLESKIP those cells are never coded."""
    from jbig2_ref import halftone_region_segment, pattern_dict_segment

    pats = _halftone_patterns()
    rng = np.random.RandomState(9)
    gray = rng.randint(0, len(pats), size=(5, 6))
    w, h = 28, 24
    kw = dict(hgx=2 << 8, hgy=1 << 8, hrx=(4 << 8) + 64, hry=96)
    stream = (
        page_info_segment(1, w, h)
        + pattern_dict_segment(2, pats)
        + halftone_region_segment(3, 2, w, h, gray, pats, enableskip=True,
                                  **kw)
    )
    out = _decode(stream, w, h)
    # skipped cells decode as gray 0; the expectation must match that
    from jbig2_ref import halftone_skip

    skip = halftone_skip(6, 5, w, h, 4, 4, **{k: kw[k] for k in
                                              ("hgx", "hgy", "hrx", "hry")})
    g2 = gray.copy()
    g2[skip.astype(bool)] = 0
    np.testing.assert_array_equal(out, _expect_halftone(g2, pats, w, h, **kw))


def test_halftone_region_mmr():
    from jbig2_ref import halftone_region_segment, pattern_dict_segment
    from test_pdf_render import _tiff_ccitt_strips

    def mmr(bm):
        return _tiff_ccitt_strips(bm, "group4")

    pats = _halftone_patterns()
    rng = np.random.RandomState(11)
    gray = rng.randint(0, len(pats), size=(4, 7))
    w, h = 28, 16
    stream = (
        page_info_segment(1, w, h)
        + pattern_dict_segment(2, pats, mmr_encode=mmr)
        + halftone_region_segment(3, 2, w, h, gray, pats, mmr_encode=mmr)
    )
    out = _decode(stream, w, h)
    np.testing.assert_array_equal(out, _expect_halftone(gray, pats, w, h))


def test_halftone_region_xnor_compose():
    from jbig2_ref import halftone_region_segment, pattern_dict_segment

    pats = _halftone_patterns()
    gray = np.array([[1, 4], [5, 2]])
    w, h = 8, 8
    stream = (
        page_info_segment(1, w, h)
        + pattern_dict_segment(2, pats)
        + halftone_region_segment(3, 2, w, h, gray, pats, defpixel=1,
                                  hcombop=1)  # AND onto all-ink region
    )
    out = _decode(stream, w, h)
    want = np.ones((h, w), np.uint8)
    for m in range(2):
        for n in range(2):
            p = pats[gray[m, n]]
            want[m * 4 : m * 4 + 4, n * 4 : n * 4 + 4] &= p
    np.testing.assert_array_equal(out, want)


def test_jbig2_halftone_and_huffman_mutation_fuzz():
    """Same crash-safety bar for the round-5 segment types: byte-level
    mutations of valid halftone and Huffman-mode streams decode or raise
    ValueError — never crash, hang, or overflow (pattern counts, grid
    sizes, Huffman table ranges and runcodes are all bounds-checked)."""
    from jbig2_ref import (
        halftone_region_segment,
        huff_symbol_dict_segment,
        huff_text_region_segment,
        pattern_dict_segment,
    )

    pats = _halftone_patterns()
    gray = np.random.RandomState(3).randint(0, len(pats), size=(4, 6))
    syms = _huff_glyphs()
    streams = [
        bytearray(
            page_info_segment(1, 24, 16)
            + pattern_dict_segment(2, pats)
            + halftone_region_segment(3, 2, 24, 16, gray, pats)
        ),
        bytearray(
            page_info_segment(1, 26, 16)
            + huff_symbol_dict_segment(2, syms)
            + huff_text_region_segment(
                3, 2, 26, 16, [(0, 2, 1), (1, 8, 1), (2, 15, 1)], syms
            )
        ),
    ]
    rng = np.random.RandomState(1)
    for stream in streams:
        for _ in range(200):
            mutated = bytearray(stream)
            for _ in range(rng.randint(1, 4)):
                mutated[rng.randint(len(mutated))] = rng.randint(256)
            try:
                out = _decode(bytes(mutated), 26, 16)
                assert out.shape == (16, 26)
            except ValueError:
                pass  # loud failure is fine
        # truncations too
        for _ in range(60):
            cut = rng.randint(1, len(stream))
            try:
                _decode(bytes(stream[:cut]), 26, 16)
            except ValueError:
                pass
