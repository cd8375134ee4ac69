"""Separable MXU resampling for axis-aligned device crops.

`device_crop.sample_lines` implements the reference's crop+resize
(perspective warp + INTER_AREA shrink, yomitoku/data/functions.py:301,
336,353) as a 2x2-supersampled bilinear *gather*.  XLA lowers that to a
per-pixel dynamic gather, which on TPU runs at a few hundred million
taps/s — measured on the v5e: 92 line crops 163 ms, four 640x640 table
crops 108 ms, the full-page detector resize ~85 ms.  For generic
projective maps the gather is unavoidable, but every PAGE-REGION crop in
the pipeline (detector/layout full-page resize, TSR and cell-detector
table crops) is AXIS-ALIGNED: its canvas->page map has no rotation or
perspective terms (ops/device_crop.region_mats builds them).

For an axis-aligned map x = sx*(u+du)+tx, y = sy*(v+dv)+ty the sample
position factors per axis, and the 2x2 supersample offsets form a
product grid {±0.25}x{±0.25}, so the averaged bilinear kernel factors
EXACTLY:

    mean_{du,dv} bilinear2d(x(u,du), y(v,dv))
        = [mean_du tent(x(u,du))] (x) [mean_dv tent(y(v,dv))]

(border-clamped bilinear = the tent max(0, 1-|l-xc|) on the clipped
coordinate, including the double-tap edge cases).  The whole resample
then becomes two dense matmuls against per-axis weight matrices — MXU
work instead of gathers: the same four table crops run in ~1 ms.

Bit-for-bit this matches sample_lines up to float-sum association
(weights are exact; the einsums run at precision='highest'), verified by
tests/test_separable_resize.py.
"""

import jax
import jax.numpy as jnp

#: per-axis supersample offsets — the 1-D factors of sample_lines' 2x2
#: canvas-space grid (device_crop._OFFSETS)
_TAPS = (-0.25, 0.25)


def _axis_weights(scale, off, n_src, n_out, supersample):
    """(b,) scale/offset of an axis-aligned map -> (b, n_src, n_out)
    resampling weights: column j holds the (clamped, supersample-
    averaged) tent weights of output coordinate x = scale*(j+du)+off."""
    j = jnp.arange(n_out, dtype=jnp.float32)
    l = jnp.arange(n_src, dtype=jnp.float32)
    taps = _TAPS if supersample else (0.0,)
    w = jnp.zeros((scale.shape[0], n_src, n_out), jnp.float32)
    for du in taps:
        xc = jnp.clip(
            scale[:, None] * (j[None, :] + du) + off[:, None],
            0.0, n_src - 1.0,
        )  # (b, n_out)
        w = w + jnp.maximum(
            0.0, 1.0 - jnp.abs(l[None, :, None] - xc[:, None, :])
        )
    return w * (1.0 / len(taps))


def sample_regions_separable(page, mats, out_hw, flip_bgr=True,
                             supersample=True, chunk=4, valid_wh=None):
    """Jittable drop-in for sample_lines on AXIS-ALIGNED region maps.

    page: (H, W, 3) uint8; mats: (B, 3, 3) canvas->page maps with
    m01 = m10 = 0 and identity bottom row (region_mats output, the
    fused-page program's on-device table slots, or unrotated line
    homographies) -> (B, oh, ow, 3) float32 crops in [0, 255], RGB when
    flip_bgr.  ``valid_wh`` (B, 2) int32 [new_w, new_h] zeroes canvas
    pixels beyond each region's fitted extent exactly like sample_lines.

    The two per-axis contractions run smallest-output-axis first (for
    32x800 line canvases that is 40 GFLOP instead of 540), and regions
    are processed ``chunk`` at a time under lax.map so the (b, W, ow)
    weight blocks and intermediates stay a few tens of MB regardless of
    B (the TSR region buckets go up to 64, line buckets to 128).
    """
    H, W = page.shape[0], page.shape[1]
    oh, ow = out_hw
    B = mats.shape[0]
    pagef = page.astype(jnp.float32)

    def _resample(m):
        wx = _axis_weights(m[:, 0, 0], m[:, 0, 2], W, ow, supersample)
        wy = _axis_weights(m[:, 1, 1], m[:, 1, 2], H, oh, supersample)
        # FLOP of each order: W-first = H*W*ow + H*ow*oh per region,
        # H-first = H*W*oh + oh*W*ow — pick the cheaper contraction
        if H * W * ow + H * ow * oh <= H * W * oh + oh * W * ow:
            t = jnp.einsum("hwc,bwj->bhjc", pagef, wx, precision="highest")
            return jnp.einsum("bhjc,bhi->bijc", t, wy, precision="highest")
        t = jnp.einsum("hwc,bhi->biwc", pagef, wy, precision="highest")
        return jnp.einsum("biwc,bwj->bijc", t, wx, precision="highest")

    if B <= chunk:
        out = _resample(mats)
    else:
        main = (B // chunk) * chunk
        out = jax.lax.map(
            _resample, mats[:main].reshape(main // chunk, chunk, 3, 3)
        ).reshape(main, oh, ow, 3)
        if main < B:  # remainder tail keeps the memory bound too
            out = jnp.concatenate([out, _resample(mats[main:])])
    if flip_bgr:
        out = out[..., ::-1]
    if valid_wh is not None:
        xo = jnp.arange(ow, dtype=jnp.int32)
        yo = jnp.arange(oh, dtype=jnp.int32)
        mask = (xo[None, None, :] < valid_wh[:, None, None, 0]) & (
            yo[None, :, None] < valid_wh[:, None, None, 1]
        )
        out = jnp.where(mask[..., None], out, 0.0)
    return out


def sample_lines_separable(page, mats, valid_wh, out_hw=(32, 800),
                           flip_bgr=True, supersample=True, chunk=8):
    """Separable line cropping for batches where every map is
    axis-ALIGNED (horizontal lines: x depends only on canvas u, y only
    on v) or axis-ANTI-aligned (vertical lines rotated 90 degrees by
    line_homographies: x depends only on v, y only on u) — check
    eligibility on the host with mats_separable().

    Both orientations factor exactly (the 2x2 supersample offsets still
    form a per-final-axis product grid; a 180-degree fallback flip only
    negates the scales, which the tent weights handle as-is), so mixed
    horizontal/vertical batches run in ONE program: both interpretations
    are contracted on the MXU and a per-region select keeps the right
    one.  That is ~80 GFLOP for a 128-line batch — ~2 ms — versus 163 ms
    for the 37M-tap gather this replaces.  Rotated minAreaRect quads
    (camera scans) are NOT separable; callers keep the gather program
    for those batches.
    """
    H, W = page.shape[0], page.shape[1]
    oh, ow = out_hw
    B = mats.shape[0]
    pagef = page.astype(jnp.float32)

    def _resample(args):
        m, vwh = args
        # aligned: x = m00*(u+du) + m02, y = m11*(v+dv) + m12
        wxa = _axis_weights(m[:, 0, 0], m[:, 0, 2], W, ow, supersample)
        wya = _axis_weights(m[:, 1, 1], m[:, 1, 2], H, oh, supersample)
        ta = jnp.einsum("hwc,bhi->biwc", pagef, wya, precision="highest")
        outa = jnp.einsum("biwc,bwj->bijc", ta, wxa, precision="highest")
        # anti-aligned: x = m01*(v+dv) + m02, y = m10*(u+du) + m12
        wxb = _axis_weights(m[:, 0, 1], m[:, 0, 2], W, oh, supersample)
        wyb = _axis_weights(m[:, 1, 0], m[:, 1, 2], H, ow, supersample)
        tb = jnp.einsum("hwc,bwi->bhic", pagef, wxb, precision="highest")
        outb = jnp.einsum("bhic,bhj->bijc", tb, wyb, precision="highest")
        aligned = (
            jnp.abs(m[:, 0, 1]) + jnp.abs(m[:, 1, 0])
            < jnp.abs(m[:, 0, 0]) + jnp.abs(m[:, 1, 1])
        )
        out = jnp.where(aligned[:, None, None, None], outa, outb)
        xo = jnp.arange(ow, dtype=jnp.int32)
        yo = jnp.arange(oh, dtype=jnp.int32)
        mask = (xo[None, None, :] < vwh[:, None, None, 0]) & (
            yo[None, :, None] < vwh[:, None, None, 1]
        )
        return jnp.where(mask[..., None], out, 0.0)

    if B <= chunk:
        out = _resample((mats, valid_wh))
    else:
        main = (B // chunk) * chunk
        out = jax.lax.map(
            _resample,
            (
                mats[:main].reshape(main // chunk, chunk, 3, 3),
                valid_wh[:main].reshape(main // chunk, chunk, 2),
            ),
        ).reshape(main, oh, ow, 3)
        if main < B:  # remainder tail keeps the memory bound too
            out = jnp.concatenate(
                [out, _resample((mats[main:], valid_wh[main:]))]
            )
    if flip_bgr:
        out = out[..., ::-1]
    return out


def mats_separable_mask(mats, tol=1e-5):
    """Host-side per-map eligibility for sample_lines_separable: a (B,)
    bool mask, True where the map is axis-aligned OR anti-aligned (one
    of each row's two linear terms ~zero) with an identity bottom row.
    Line homographies satisfy this whenever the source quad is an
    unrotated rectangle — the overwhelmingly common case for digitally-
    rendered documents (in either text direction); camera scans with
    skewed minAreaRect quads get False and keep the gather program."""
    import numpy as np

    m = np.asarray(mats)
    if m.size == 0:
        return np.zeros((0,), bool)
    persp = (
        np.abs(m[:, 2, 0]) + np.abs(m[:, 2, 1]) + np.abs(m[:, 2, 2] - 1.0)
    )
    scale = np.abs(m[:, :2, :2]).max(axis=(1, 2)) + 1e-12
    aligned = (np.abs(m[:, 0, 1]) + np.abs(m[:, 1, 0])) / scale < tol
    anti = (np.abs(m[:, 0, 0]) + np.abs(m[:, 1, 1])) / scale < tol
    return (aligned | anti) & (persp < tol)


def mats_separable(mats, tol=1e-5):
    """True when EVERY map in (B, 3, 3) ``mats`` is separable — the
    whole-batch gate used by the jitted program selection (see
    mats_separable_mask for the per-map predicate)."""
    return bool(mats_separable_mask(mats, tol).all())
