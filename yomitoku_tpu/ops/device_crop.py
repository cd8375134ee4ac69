"""Device-side line cropping for the recognizer.

The reference preprocesses every word quad on the host — perspective warp
(cv2.warpPerspective), vertical-line rotation, and aspect-preserving
resize-with-padding (data/dataset.py:33, data/functions.py:301,336,353) —
then uploads the (N, 32, 800, 3) crop batch.  On this platform that upload
is the single largest host<->device transfer of a page (~7 MB at N=92),
and the crop loop is host-CPU bound.

Here the page is uploaded ONCE as uint8 and the whole crop pipeline runs
on device as one composed projective map per line:

    canvas (32x800) --inverse pad/resize--> rotated crop --undo rotation-->
    rectified crop --homography--> page

The three stages collapse into a single 3x3 matrix per line, computed on
the host (cheap: one 4-point homography solve per quad), so the device
program is a batched bilinear gather.  The resize step approximates the
host's INTER_AREA shrink with a 2x2 supersampled bilinear tap (exact for
scale >= 0.5, mild aliasing beyond — recognition-neutral; the host path
remains available for exact parity via YOMITOKU_TPU_HOST_CROPS=1).
"""

import functools as _functools

import cv2
import numpy as np

import jax
import jax.numpy as jnp

#: supersample offsets in canvas pixel space (2x2 box for INTER_AREA-like
#: shrink filtering)
_OFFSETS = ((-0.25, -0.25), (-0.25, 0.25), (0.25, -0.25), (0.25, 0.25))


def line_homographies(
    quads, out_hw=(32, 800), thresh_aspect: float = 2.0, rot180: bool = False
):
    """Per-quad composed canvas->page homographies.

    Mirrors the host pipeline exactly:
      * rect dims = (|p0-p1|, |p1-p2|) as ints (extract_roi_with_perspective)
      * rotate 90deg CCW when h > thresh_aspect * w (rotate_text_image)
      * shrink-only, top-left anchored fit into out_hw (resize_with_padding)

    rot180 additionally flips the (possibly vertically-rotated) crop by
    180deg — the recognizer's orientation-fallback retry
    (text_recognizer.py: cv2.ROTATE_180 on the kept ROI).

    Returns (mats (N, 3, 3) float32, valid (N, 2) int32 [new_w, new_h]).
    """
    oh, ow = out_hw
    mats = np.zeros((len(quads), 3, 3), np.float32)
    valid = np.zeros((len(quads), 2), np.int32)
    for i, quad in enumerate(quads):
        # host path casts quads to int64 before measuring/warping
        q = np.asarray(quad, dtype=np.int64).astype(np.float64)
        w = max(int(np.linalg.norm(q[0] - q[1])), 1)
        h = max(int(np.linalg.norm(q[1] - q[2])), 1)
        # rect -> page
        rect = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
        M_rp = cv2.getPerspectiveTransform(rect, q.astype(np.float32))

        rotated = h > thresh_aspect * w
        if rotated:
            # rotated crop (h_rot, w_rot) = (w, h); rotated (x, y) ->
            # rect (x_r, y_r) = (w - 1 - y, x)
            R = np.array(
                [[0.0, -1.0, w - 1.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                np.float64,
            )
            rw, rh = h, w
        else:
            R = np.eye(3)
            rw, rh = w, h

        if rot180:
            # rotated-crop coords (x, y) -> (rw - 1 - x, rh - 1 - y)
            R = R @ np.array(
                [
                    [-1.0, 0.0, rw - 1.0],
                    [0.0, -1.0, rh - 1.0],
                    [0.0, 0.0, 1.0],
                ],
                np.float64,
            )

        scale = min(1.0, ow / rw, oh / rh)
        new_w = max(int(rw * scale), 1)
        new_h = max(int(rh * scale), 1)
        # cv2.resize maps with per-axis factors rw/new_w (int truncation
        # makes them differ slightly from 1/scale):
        # canvas u -> rotated-crop coordinate (u + 0.5) * rw/new_w - 0.5
        ix = rw / new_w
        iy = rh / new_h
        S = np.array(
            [
                [ix, 0.0, 0.5 * ix - 0.5],
                [0.0, iy, 0.5 * iy - 0.5],
                [0.0, 0.0, 1.0],
            ],
            np.float64,
        )
        mats[i] = (M_rp.astype(np.float64) @ R @ S).astype(np.float32)
        valid[i] = (new_w, new_h)
    return mats, valid


def pad_page(page: np.ndarray, align: int = 512):
    """Pad a (H, W, 3) uint8 page to /align so the crop program compiles
    for a bounded set of page shapes.  Padding is black; crops never
    sample it (quads are validated inside the page)."""
    h, w = page.shape[:2]
    ph = -(-h // align) * align
    pw = -(-w // align) * align
    if (ph, pw) == (h, w):
        return np.ascontiguousarray(page)
    out = np.zeros((ph, pw, 3), page.dtype)
    out[:h, :w] = page
    return out


def region_mats(regions, out_hw):
    """Axis-aligned page regions (x1, y1, x2, y2) -> canvas->page affine
    maps for an INTER_AREA-style resize to out_hw (the layout/TSR/cell
    detector preprocess: crop + cv2.resize INTER_AREA).

    Returns (mats (N, 3, 3) float32, valid (N, 2) int32 = full canvas).
    """
    oh, ow = out_hw
    mats = np.zeros((len(regions), 3, 3), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(regions):
        sx = (x2 - x1) / ow
        sy = (y2 - y1) / oh
        mats[i] = np.array(
            [
                [sx, 0.0, x1 + 0.5 * sx - 0.5],
                [0.0, sy, y1 + 0.5 * sy - 0.5],
                [0.0, 0.0, 1.0],
            ],
            np.float32,
        )
    valid = np.tile(np.int32([ow, oh]), (len(regions), 1))
    return mats, valid


@_functools.lru_cache(maxsize=512)
def staged_page_mat(page_hw, out_hw):
    """Device-staged (1, 3, 3) affine for a full-page resize.

    Page sizes repeat across a document (and the det /32 buckets quantize
    them further), but re-uploading even the 36-byte mat per dispatch
    costs a tunnel transfer ack (~18 ms of the 21.7 ms fused-dispatch
    segment measured on the dev link).  Cache the committed device buffer
    keyed by (page_hw, out_hw); entries are 36 bytes each."""
    import jax.numpy as jnp

    h, w = page_hw
    mat, _ = region_mats([(0, 0, w, h)], out_hw)
    return jnp.asarray(mat)


@_functools.lru_cache(maxsize=512)
def staged_wh(w, h):
    """Device-staged (1, 2) float32 [[w, h]] (see staged_page_mat)."""
    import jax.numpy as jnp

    return jnp.asarray([[w, h]], jnp.float32)


def device_crops_enabled() -> bool:
    """Device-side crops/resizes are the default on real accelerators;
    the host cv2 path remains the exact-parity reference (and the faster
    choice on the CPU backend).  YOMITOKU_TPU_HOST_CROPS=1 forces host;
    YOMITOKU_TPU_DEVICE_CROPS=1 forces device even on the CPU backend
    (multi-chip dryruns exercise the fused/device-crop programs on a
    virtual CPU mesh)."""
    import os

    if os.environ.get("YOMITOKU_TPU_HOST_CROPS"):
        return False
    if os.environ.get("YOMITOKU_TPU_DEVICE_CROPS"):
        return True
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(1, 2))
def _pad_on_device(x, ph, pw):
    h, w = x.shape[:2]
    return jnp.pad(x, ((0, ph - h), (0, pw - w), (0, 0)))


class DevicePage:
    """One uint8 BGR page uploaded once and shared by detector, layout,
    TSR/cell, and recognizer programs, so the page image crosses the
    host<->device link exactly once.

    The exact-size page is uploaded and padded to a /align shape bucket
    ON DEVICE (a module-level jitted pad cached per (page, bucket)
    shape, while the big fused programs compile once per bucket) — the
    padding bytes never cross the link."""

    def __init__(self, img_bgr: np.ndarray, align: int = 512):
        from ..utils.stagetrace import segment

        h, w = img_bgr.shape[:2]
        self.hw = (h, w)
        ph = -(-h // align) * align
        pw = -(-w // align) * align
        with segment("page", "upload", nbytes=img_bgr.nbytes):
            dev = jnp.asarray(np.ascontiguousarray(img_bgr))
            if (ph, pw) != (h, w):
                dev = _pad_on_device(dev, ph, pw)
        self.dev = dev


#: crop-batch buckets shared by the TSR / cell-detector page paths
REGION_BUCKETS = (1, 2, 4, 8, 16, 64)


def forward_regions_from_page(model, page, data, out_hw):
    """Shared TSR / cell-detector device-page path: per-table crop
    regions -> bucket-padded fused crop+forward.

    Returns (preds, sizes, n) where ``preds`` is still PADDED to the
    bucket and ``sizes`` includes (1, 1) dummies — postprocess the full
    padded batch and slice its per-image results to ``n`` afterwards
    (slicing the device outputs first would recompile the jitted top-k
    for every distinct table count).  Counts beyond the largest bucket
    run unpadded."""
    regions = [
        (
            d["offset"][0], d["offset"][1],
            d["offset"][0] + d["size"][1],
            d["offset"][1] + d["size"][0],
        )
        for d in data
    ]
    n = len(regions)
    target = next((b for b in REGION_BUCKETS if n <= b), n)
    regions = regions + [(0, 0, 1, 1)] * (target - n)
    mats, _ = region_mats(regions, out_hw)
    preds = model.forward_from_page(page.dev, mats, out_hw)
    sizes = [[d["size"][1], d["size"][0]] for d in data]
    sizes += [[1, 1]] * (target - n)
    return preds, sizes, n


def dispatch_regions_from_page(model, page, data, out_hw):
    """Enqueue the fused crop+forward programs for every region chunk
    (chunked at the largest REGION_BUCKET so pages with more tables than
    the bucket ladder reuse the 64-wide program instead of compiling a
    fresh unpadded batch per distinct count).  Returns the list of
    (device preds, sizes, n) chunks WITHOUT syncing — callers overlap
    host work with the device compute, then ``collect_filtered_regions``.
    """
    cap = REGION_BUCKETS[-1]
    return [
        forward_regions_from_page(model, page, data[s : s + cap], out_hw)
        for s in range(0, len(data), cap)
    ]


def collect_filtered_regions(chunks, postprocessor, thresh):
    """Postprocess each PADDED chunk (slicing device outputs first would
    recompile the jitted top-k per table count) and return the filtered
    per-region list."""
    filtered = []
    for preds, sizes, n in chunks:
        filtered.extend(postprocessor(preds, sizes, thresh)[:n])
    return filtered


def filtered_regions_from_page(model, page, data, out_hw, postprocessor,
                               thresh):
    """Fused crop+forward+postprocess for the TSR / cell-detector page
    paths; see dispatch_regions_from_page / collect_filtered_regions."""
    chunks = dispatch_regions_from_page(model, page, data, out_hw)
    return collect_filtered_regions(chunks, postprocessor, thresh)


def sample_lines(page, mats, valid_wh, out_hw=(32, 800), flip_bgr=True,
                 supersample=True):
    """Jittable: (H, W, 3) uint8 page + (B, 3, 3) canvas->page homographies
    -> (B, oh, ow, 3) float32 crops in [0, 255] (RGB when flip_bgr).

    2x2 supersampled bilinear gather with border clamping (single tap when
    supersample=False); canvas pixels beyond each line's (new_w, new_h)
    are zero (black padding).
    """
    H, W = page.shape[0], page.shape[1]
    oh, ow = out_hw
    B = mats.shape[0]
    flat = page.reshape(-1, 3)

    yo, xo = jnp.mgrid[0:oh, 0:ow].astype(jnp.float32)  # (oh, ow)

    def gather_bilinear(x, y):
        # x, y: (B, oh, ow) page coords; clamp-to-border sampling
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)

        def tap(yi, xi):
            return jnp.take(flat, yi * W + xi, axis=0).astype(jnp.float32)

        top = tap(y0, x0) * (1 - fx) + tap(y0, x1) * fx
        bot = tap(y1, x0) * (1 - fx) + tap(y1, x1) * fx
        return top * (1 - fy) + bot * fy

    def sample_at(duv, acc):
        u = xo + duv[0]
        v = yo + duv[1]
        # per-line projective map
        m = mats[:, None, None, :, :]  # (B, 1, 1, 3, 3)
        xs = m[..., 0, 0] * u + m[..., 0, 1] * v + m[..., 0, 2]
        ys = m[..., 1, 0] * u + m[..., 1, 1] * v + m[..., 1, 2]
        ws = m[..., 2, 0] * u + m[..., 2, 1] * v + m[..., 2, 2]
        ws = jnp.where(jnp.abs(ws) < 1e-8, 1e-8, ws)
        return acc + gather_bilinear(xs / ws, ys / ws)

    zero = jnp.zeros((B, oh, ow, 3), jnp.float32)
    if supersample:
        offsets = jnp.asarray(_OFFSETS, jnp.float32)
        acc = jax.lax.fori_loop(
            0, 4, lambda k, a: sample_at(offsets[k], a), zero
        )
        crops = acc * 0.25
    else:  # single centered tap (plain bilinear)
        crops = sample_at(jnp.zeros((2,), jnp.float32), zero)
    if flip_bgr:
        crops = crops[..., ::-1]
    mask = (xo[None] < valid_wh[:, None, None, 0].astype(jnp.float32)) & (
        yo[None] < valid_wh[:, None, None, 1].astype(jnp.float32)
    )
    return jnp.where(mask[..., None], crops, 0.0)
