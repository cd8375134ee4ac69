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
from .device_crop import region_mats


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
        det_mat, _ = region_mats([(0, 0, w, h)], det_out_hw)
        lay_mat, _ = region_mats([(0, 0, w, h)], lay_out_hw)
        orig_wh = jnp.asarray([[w, h]], jnp.float32)
        with segment("det+layout", "dispatch"):
            wire = self._fn(
                self.det.dparams, self.lay.dparams, page.dev,
                jnp.asarray(det_mat), tuple(det_out_hw),
                jnp.asarray(lay_mat), tuple(lay_out_hw), orig_wh,
            )
        with segment("det+layout", "sync", nbytes=wire.nbytes):
            arr = np.asarray(wire)

        oh, ow = det_out_hw
        n_prob = oh * ow
        with segment("det", "unpack"):
            prob_wire = arr[:n_prob]
            if prob_wire.size and (oh % 4 == 0 and ow % 4 == 0) and (
                self._prob_is_packed()
            ):
                prob_wire = prob_wire.reshape(1, oh // 4, ow // 4, 16)
            else:
                prob_wire = prob_wire.reshape(1, oh, ow)
            prob = self.det._unpack_u8(prob_wire).astype(np.float32) * (
                1.0 / 255.0
            )
        packed = (
            arr[n_prob:].view(np.float32).reshape(1, self.k, 6).copy()
        )
        return prob, packed

    def _prob_is_packed(self) -> bool:
        from ..models.dbnet import _use_packed_head

        return _use_packed_head(None)
