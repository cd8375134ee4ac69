"""One-dispatch det+layout page program.

DocumentAnalyzer runs TextDetector and LayoutParser on the SAME
DevicePage; as two separate jitted programs each pays its own dispatch
and its own device->host readback — on the tunnel-attached dev platform
every sync costs ~30 ms of round-trip latency, so per-page round trips
dominate per-page bytes.  This module fuses both forwards (and the
RT-DETR top-k) into ONE jitted program returning ONE packed uint8
buffer: the depth-packed DBNet probability map followed by the
bitcast (1, k, 6) layout top-k.

The reference runs the two models in a 2-thread pool
(yomitoku/document_analyzer.py:603-612); on one chip the forwards
serialize in the FIFO anyway, so fusing loses no device parallelism.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dbnet import DBNet
from ..models.rtdetr import RTDETRv2
from ..postprocessor.rtdetr_postprocessor import _topk_device
from ..utils.stagetrace import segment
from .device_crop import region_mats, staged_page_mat, staged_wh


class FusedDetLayout:
    """Callable: (DevicePage, page_hw, det_out_hw, lay_out_hw) ->
    (det prob map (1, oh, ow) float32, layout packed (1, k, 6) float32).
    """

    def __init__(self, det_model, lay_model, num_top_queries: int):
        self.det = det_model
        self.lay = lay_model
        self.k = int(num_top_queries)
        self._fn = jax.jit(partial(self._fwd, self), static_argnums=(4, 6))

    @staticmethod
    def _fwd(self, det_params, lay_params, page, det_mat, det_hw, lay_mat,
             lay_hw, orig_wh):
        prob = DBNet._forward_from_page(
            self.det, det_params, page, det_mat, det_hw
        )
        preds = RTDETRv2._forward_from_page(
            self.lay, lay_params, page, lay_mat, lay_hw
        )
        packed = _topk_device(
            preds["pred_logits"], preds["pred_boxes"], orig_wh, self.k
        )
        wire = jnp.concatenate(
            [
                prob.reshape(-1),
                jax.lax.bitcast_convert_type(packed, jnp.uint8).reshape(-1),
            ]
        )
        return wire

    def __call__(self, page, page_hw, det_out_hw, lay_out_hw):
        h, w = page_hw
        det_mat = staged_page_mat(tuple(page_hw), tuple(det_out_hw))
        lay_mat = staged_page_mat(tuple(page_hw), tuple(lay_out_hw))
        orig_wh = staged_wh(w, h)
        with segment("det+layout", "dispatch"):
            wire = self._fn(
                self.det.dparams, self.lay.dparams, page.dev,
                det_mat, tuple(det_out_hw),
                lay_mat, tuple(lay_out_hw), orig_wh,
            )
        with segment("det+layout", "sync", nbytes=wire.nbytes):
            arr = np.asarray(wire)

        oh, ow = det_out_hw
        n_prob = oh * ow
        with segment("det", "unpack"):
            prob = _unpack_prob(self.det, arr[:n_prob], det_out_hw)
        packed = (
            arr[n_prob:].view(np.float32).reshape(1, self.k, 6).copy()
        )
        return prob, packed


def _unpack_prob(det_model, flat_u8, det_out_hw):
    """Wire u8 prob section -> (1, oh, ow) u8 map (value = prob*255).
    Stays u8: the native postprocessor thresholds/scores in the u8
    domain, and the host float conversion of the 1+ MB map costs 75+ ms
    on a 1-core host."""
    from ..models.dbnet import _use_packed_head

    oh, ow = det_out_hw
    if oh % 4 == 0 and ow % 4 == 0 and _use_packed_head(None):
        flat_u8 = flat_u8.reshape(1, oh // 4, ow // 4, 16)
    else:
        flat_u8 = flat_u8.reshape(1, oh, ow)
    return det_model._unpack_u8(flat_u8)


class FusedPageAnalysis:
    """det + layout + a per-table region model in ONE device program /
    ONE readback.  DocumentAnalyzer fuses the TableStructureRecognizer;
    TableSemanticParser reuses the same program shape with the
    CellDetector (2500-query RT-DETR) as the region model.

    The host only learns which boxes are tables after the layout
    readback — a round trip the TSR dispatch then trails by.  Instead
    the program itself selects the top ``max_tables`` table-classified
    layout detections (score > threshold), crops them from the shared
    page (reproducing the host's int-truncate + clamp geometry), runs
    the TSR forward on the fixed-size slot batch, and ships everything
    in one packed wire:

        [det prob map u8] [layout (1,k,6) f32] [tsr (K,q,6) f32]
        [slot boxes (K,4) f32] [slot valid (K,) f32]

    Pages with more than ``max_tables`` kept tables fall back to the
    chunked region path for the unmatched ones (rare).  Padded slots
    crop a degenerate 1x1 region; the host drops them by slot validity.
    """

    def __init__(self, det_model, lay_model, tsr_model, lay_top_k,
                 tsr_top_k, table_label, lay_thresh, max_tables=4,
                 trace_label="det+layout+tsr"):
        import os

        self.det = det_model
        self.lay = lay_model
        self.tsr = tsr_model
        self.trace_label = trace_label
        self.lay_k = int(lay_top_k)
        # The wire ships the region model's top-k rows per slot.  The
        # CellDetector's 2500-query top-k would put 240 KB/page on a
        # round-trip-priced link when real tables keep far fewer than 640
        # cells above threshold — cap the wire and let consume_region_slots
        # fall back loudly (chunked full-k region dispatch) for any slot
        # whose capped list might have truncated above-threshold rows.
        cap = int(os.environ.get("YOMITOKU_TPU_FUSED_REGION_TOPK", "640"))
        self.tsr_full_k = int(tsr_top_k)
        self.tsr_k = (
            min(self.tsr_full_k, cap) if cap > 0 else self.tsr_full_k
        )
        self.table_label = int(table_label)
        self.lay_thresh = float(lay_thresh)
        self.max_tables = int(max_tables)
        self._fn = jax.jit(partial(self._fwd, self), static_argnums=(5, 7, 8))
        self._bfn = jax.jit(partial(self._bfwd, self), static_argnums=(6, 7, 8))

    @staticmethod
    def _fwd(self, det_params, lay_params, tsr_params, page, det_mat,
             det_hw, lay_mat, lay_hw, tsr_hw, orig_wh):
        prob = DBNet._forward_from_page(
            self.det, det_params, page, det_mat, det_hw
        )
        preds = RTDETRv2._forward_from_page(
            self.lay, lay_params, page, lay_mat, lay_hw
        )
        packed = _topk_device(
            preds["pred_logits"], preds["pred_boxes"], orig_wh, self.lay_k
        )

        # ---- table slot selection (mirrors the host's filter_packed
        # clip + filtering int-truncate + preprocess clamp)
        row = packed[0]
        W = orig_wh[0, 0]
        H = orig_wh[0, 1]
        score = jnp.where(
            (row[:, 0] == self.table_label) & (row[:, 1] > self.lay_thresh),
            row[:, 1], -1.0,
        )
        top_score, top_idx = jax.lax.top_k(score, self.max_tables)
        valid = top_score > 0.0
        b = jnp.take(row, top_idx, axis=0)[:, 2:6]
        x1 = jnp.clip(jnp.trunc(jnp.clip(b[:, 0], 0.0, None)), 0.0, W)
        y1 = jnp.clip(jnp.trunc(jnp.clip(b[:, 1], 0.0, None)), 0.0, H)
        x2 = jnp.clip(jnp.trunc(jnp.clip(b[:, 2], 0.0, W)), x1, W)
        y2 = jnp.clip(jnp.trunc(jnp.clip(b[:, 3], 0.0, H)), y1, H)
        # padded / degenerate slots crop a 1x1 corner
        ok = valid & (x2 > x1) & (y2 > y1)
        x1 = jnp.where(ok, x1, 0.0)
        y1 = jnp.where(ok, y1, 0.0)
        x2 = jnp.where(ok, x2, 1.0)
        y2 = jnp.where(ok, y2, 1.0)
        sel = jnp.stack([x1, y1, x2, y2], axis=1)  # (K, 4)

        oh, ow = tsr_hw
        sx = (x2 - x1) / ow
        sy = (y2 - y1) / oh
        zeros = jnp.zeros_like(sx)
        ones = jnp.ones_like(sx)
        mats = jnp.stack(
            [
                jnp.stack([sx, zeros, x1 + 0.5 * sx - 0.5], 1),
                jnp.stack([zeros, sy, y1 + 0.5 * sy - 0.5], 1),
                jnp.stack([zeros, zeros, ones], 1),
            ],
            axis=1,
        )  # (K, 3, 3)
        from .separable_resize import sample_regions_separable

        crops = sample_regions_separable(page, mats, tsr_hw, flip_bgr=True)
        x = crops.astype(self.tsr.dtype) * (1.0 / 255.0)
        preds_t = self.tsr.core.apply(tsr_params, x)
        sizes_t = jnp.stack([x2 - x1, y2 - y1], axis=1)  # (K, 2) (w, h)
        packed_t = _topk_device(
            preds_t["pred_logits"], preds_t["pred_boxes"], sizes_t,
            self.tsr_k,
        )

        u8 = lambda a: jax.lax.bitcast_convert_type(
            a.astype(jnp.float32), jnp.uint8
        ).reshape(-1)
        return jnp.concatenate(
            [
                prob.reshape(-1),
                u8(packed), u8(packed_t), u8(sel),
                u8(valid.astype(jnp.float32)),
            ]
        )

    def __call__(self, page, page_hw, det_out_hw, lay_out_hw, tsr_out_hw):
        h, w = page_hw
        det_mat = staged_page_mat(tuple(page_hw), tuple(det_out_hw))
        lay_mat = staged_page_mat(tuple(page_hw), tuple(lay_out_hw))
        orig_wh = staged_wh(w, h)
        with segment(self.trace_label, "dispatch"):
            wire = self._fn(
                self.det.dparams, self.lay.dparams, self.tsr.dparams,
                page.dev,
                det_mat, tuple(det_out_hw),
                lay_mat, tuple(lay_out_hw), tuple(tsr_out_hw),
                orig_wh,
            )
        with segment(self.trace_label, "sync", nbytes=wire.nbytes):
            arr = np.asarray(wire)
        return self._split_wire(arr, det_out_hw)

    def _split_wire(self, arr, det_out_hw):
        """One page's packed wire bytes -> (prob, packed, packed_t, sel,
        valid) host arrays."""
        oh, ow = det_out_hw
        K, k, q = self.max_tables, self.lay_k, self.tsr_k
        n_prob = oh * ow
        cuts = np.cumsum([n_prob, k * 24, K * q * 24, K * 16, K * 4])
        with segment("det", "unpack"):
            prob = _unpack_prob(self.det, arr[: cuts[0]], det_out_hw)
        f32 = lambda a: np.ascontiguousarray(a).view(np.float32)
        packed = f32(arr[cuts[0] : cuts[1]]).reshape(1, k, 6)
        packed_t = f32(arr[cuts[1] : cuts[2]]).reshape(K, 1, q, 6)
        sel = f32(arr[cuts[2] : cuts[3]]).reshape(K, 4).astype(np.int64)
        valid = f32(arr[cuts[3] : cuts[4]]) > 0.0
        return prob, packed, packed_t, sel, valid

    def consume_region_slots(self, region_data, packed_t, sel, sel_valid,
                             postprocessor, threshold):
        """Match each host-kept region (``region_data`` from
        ``_preprocess_meta``: dicts with "offset"/"size") to its device
        slot by the identically truncated+clamped box and run the host
        threshold filter on that slot's wire rows.

        Returns (filtered, missing_idx, missing_data): ``filtered[i]`` is
        the {labels, boxes, scores} dict for region i or None when it must
        be re-dispatched through the chunked full-k region path — either
        because no slot matched (more than max_tables, dedup
        disagreement) or because the capped wire top-k may have truncated
        above-threshold rows (every shipped row passed the threshold, so
        rows k+1.. could too; logged loudly, never silent)."""
        slot_of = {
            tuple(sel[j]): j for j in range(len(sel_valid)) if sel_valid[j]
        }
        filtered = [None] * len(region_data)
        missing_idx, missing_data = [], []
        for i, d in enumerate(region_data):
            x1, y1 = d["offset"]
            hh, ww = d["size"]
            j = slot_of.pop((x1, y1, x1 + ww, y1 + hh), None)
            one = None
            if j is not None:
                one = postprocessor.filter_packed(
                    packed_t[j], [[ww, hh]], threshold
                )[0]
                if (
                    self.tsr_k < self.tsr_full_k
                    and len(one["scores"]) >= self.tsr_k
                ):
                    from ..utils.logger import set_logger

                    set_logger(__name__, "WARNING").warning(
                        "fused region wire top-%d saturated above "
                        "threshold for region %s; re-dispatching it at "
                        "full top-%d (raise YOMITOKU_TPU_FUSED_REGION_TOPK"
                        " to avoid the extra round trip)",
                        self.tsr_k, d["offset"], self.tsr_full_k,
                    )
                    one = None
            if one is None:
                missing_idx.append(i)
                missing_data.append(d)
            filtered[i] = one
        return filtered, missing_idx, missing_data

    # ------------------------------------------------- page-axis batching

    @staticmethod
    def _bfwd(self, det_params, lay_params, tsr_params, pages, det_mats,
              lay_mats, det_hw, lay_hw, tsr_hw, orig_whs):
        """vmap of _fwd over a leading page axis.  Pages placed dp-sharded
        partition the whole program page-parallel (det, layout, TSR crops
        and forwards all batch over pages — XLA needs no cross-page
        collectives, so the shards never talk)."""

        def one(page, det_mat, lay_mat, orig_wh):
            return FusedPageAnalysis._fwd(
                self, det_params, lay_params, tsr_params, page,
                det_mat, det_hw, lay_mat, lay_hw, tsr_hw, orig_wh,
            )

        return jax.vmap(one)(pages, det_mats, lay_mats, orig_whs)

    def batch_call(self, pages_dev, page_hws, det_out_hw, lay_out_hw,
                   tsr_out_hw):
        """(N, PH, PW, 3) uint8 stacked pages (place dp-sharded for
        multi-chip page parallelism) + per-page true (h, w) -> list of N
        per-page (prob, packed, packed_t, sel, valid) tuples.

        All pages in a call share the same padded shape and det/lay/tsr
        output shapes (group upstream); ONE dispatch and ONE readback
        cover the whole page batch."""
        det_mats, lay_mats, whs = [], [], []
        for h, w in page_hws:
            det_mats.append(region_mats([(0, 0, w, h)], det_out_hw)[0])
            lay_mats.append(region_mats([(0, 0, w, h)], lay_out_hw)[0])
            whs.append([[w, h]])
        with segment(self.trace_label, "dispatch"):
            wires = self._bfn(
                self.det.dparams, self.lay.dparams, self.tsr.dparams,
                pages_dev,
                jnp.asarray(np.asarray(det_mats, np.float32)),
                jnp.asarray(np.asarray(lay_mats, np.float32)),
                tuple(det_out_hw), tuple(lay_out_hw), tuple(tsr_out_hw),
                jnp.asarray(np.asarray(whs, np.float32)),
            )
        with segment(self.trace_label, "sync", nbytes=wires.nbytes):
            arr = np.asarray(wires)
        return [self._split_wire(arr[i], det_out_hw) for i in range(len(arr))]
