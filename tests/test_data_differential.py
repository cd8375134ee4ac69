"""Differential tests of the data layer against the REAL reference
implementation (/root/reference/src/yomitoku/data/functions.py), loaded
with pypdfium2 stubbed (only load_pdf touches it).

These host functions define the pixel-exact preprocessing contract that
the device paths approximate — resize geometry, standardization,
perspective crop, vertical-line rotation, pad-to-canvas — so the host
implementations must match the reference bit-for-bit (float) /
exactly (uint8)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import yomitoku_tpu.data.functions as ours


@pytest.fixture(scope="module")
def ref():
    # stub pypdfium2 only while loading the reference module (it is only
    # touched by load_pdf, which these tests never call); leaving the
    # stub in sys.modules would fool our own PDF-backend prober
    added_stub = "pypdfium2" not in sys.modules
    if added_stub:
        sys.modules["pypdfium2"] = types.ModuleType("pypdfium2")
    pkg_root = "ref_datafns_pkg"
    pkg = types.ModuleType(pkg_root)
    pkg.__path__ = ["/root/reference/src/yomitoku"]
    sys.modules[pkg_root] = pkg
    for sub, path in (
        ("utils", "/root/reference/src/yomitoku/utils"),
        ("data", "/root/reference/src/yomitoku/data"),
    ):
        m = types.ModuleType(f"{pkg_root}.{sub}")
        m.__path__ = [path]
        sys.modules[f"{pkg_root}.{sub}"] = m

    def _load(modname, fpath):
        spec = importlib.util.spec_from_file_location(modname, fpath)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        return mod

    _load(f"{pkg_root}.constants",
          "/root/reference/src/yomitoku/constants.py")
    _load(f"{pkg_root}.utils.logger",
          "/root/reference/src/yomitoku/utils/logger.py")
    mod = _load(f"{pkg_root}.data.functions",
                "/root/reference/src/yomitoku/data/functions.py")
    if added_stub:
        del sys.modules["pypdfium2"]
    return mod


def _img(h, w, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), np.uint8
    )


@pytest.mark.parametrize(
    "h,w", [(1280, 960), (720, 1600), (333, 517), (2339, 1654), (64, 4000)]
)
def test_resize_shortest_edge_differential(ref, h, w):
    img = _img(h, w, h + w)
    a = ours.resize_shortest_edge(img, 1280, 1600)
    b = ref.resize_shortest_edge(img, 1280, 1600)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_standardization_differential(ref):
    img = _img(64, 96, 3)
    np.testing.assert_allclose(
        ours.standardization_image(img),
        ref.standardization_image(img),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize(
    "quad",
    [
        [[10, 10], [90, 12], [88, 40], [12, 38]],   # mild perspective
        [[50, 5], [70, 5], [70, 95], [50, 95]],     # vertical line
        [[0, 0], [99, 0], [99, 59], [0, 59]],       # full frame
    ],
)
def test_extract_roi_with_perspective_differential(ref, quad):
    img = _img(60, 100, 7)
    a = ours.extract_roi_with_perspective(img, quad)
    b = ref.extract_roi_with_perspective(img, quad)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_rotate_and_pad_differential(ref):
    for seed, (h, w) in enumerate([(90, 30), (30, 90), (32, 800), (5, 3)]):
        roi = _img(h, w, seed)
        ra = ours.rotate_text_image(roi, thresh_aspect=2)
        rb = ref.rotate_text_image(roi, thresh_aspect=2)
        np.testing.assert_array_equal(ra, rb)
        pa = ours.resize_with_padding(ra, (32, 800))
        pb = ref.resize_with_padding(rb, (32, 800))
        np.testing.assert_array_equal(pa, pb)


def test_validate_quads_differential(ref):
    img = _img(50, 80, 1)
    cases = [
        [[0, 0], [80, 0], [80, 50], [0, 50]],        # exactly inside
        [[0, 0], [81, 0], [81, 50], [0, 50]],        # out of bounds
        [[-1, 0], [10, 0], [10, 10], [-1, 10]],      # negative
        [[0, 0], [10, 0], [10, 10]],                 # 3 points
    ]
    for q in cases:
        try:
            b = ref.validate_quads(img, q)
        except Exception:
            b = None
        a = ours.validate_quads(img, q)
        assert bool(a) == bool(b), q
