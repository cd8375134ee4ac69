"""RT-DETRv2 detector (layout / table-structure / cell detection), TPU-native.

Re-design of the reference RTDETRv2 (yomitoku/models/rtdetr.py:9): PResNet
backbone -> HybridEncoder -> deformable-attention decoder, one jitted NHWC
XLA program.  The postprocess top-k + gather also runs on device
(postprocessor/rtdetr_postprocessor.py) so only (num_top_queries)-sized
arrays return to the host.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .base import JaxModel, default_compute_dtype
from .layers.presnet import PResNet
from .layers.rtdetr_decoder import RTDETRTransformerv2
from .layers.rtdetr_encoder import HybridEncoder


class RTDETRv2Core(nn.Module):
    cfg: dict
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) standardized
        bcfg = self.cfg["PResNet"]
        ecfg = self.cfg["HybridEncoder"]
        dcfg = self.cfg["RTDETRTransformerv2"]
        feats = PResNet(
            depth=bcfg["depth"],
            variant=bcfg["variant"],
            return_idx=tuple(bcfg["return_idx"]),
            num_stages=bcfg["num_stages"],
            dtype=self.dtype,
            name="backbone",
        )(images)
        feats = HybridEncoder(
            in_channels=tuple(ecfg["in_channels"]),
            feat_strides=tuple(ecfg["feat_strides"]),
            hidden_dim=ecfg["hidden_dim"],
            use_encoder_idx=tuple(ecfg["use_encoder_idx"]),
            num_encoder_layers=ecfg["num_encoder_layers"],
            nhead=ecfg["nhead"],
            dim_feedforward=ecfg["dim_feedforward"],
            enc_act=ecfg["enc_act"],
            expansion=ecfg["expansion"],
            depth_mult=ecfg["depth_mult"],
            act=ecfg["act"],
            dtype=self.dtype,
            name="encoder",
        )(feats)
        return RTDETRTransformerv2(
            num_classes=dcfg["num_classes"],
            hidden_dim=dcfg["hidden_dim"],
            num_queries=dcfg["num_queries"],
            feat_channels=tuple(dcfg["feat_channels"]),
            feat_strides=tuple(dcfg["feat_strides"]),
            num_levels=dcfg["num_levels"],
            num_points=tuple(dcfg["num_points"]),
            nhead=8,
            num_layers=dcfg["num_layers"],
            eval_spatial_size=tuple(dcfg["eval_spatial_size"]),
            eval_idx=dcfg["eval_idx"],
            dtype=self.dtype,
            name="decoder",
        )(feats)


class RTDETRv2(JaxModel):
    def __init__(self, cfg, dtype=None):
        super().__init__(cfg)
        self.dtype = dtype or default_compute_dtype()
        self.num_layers = cfg.RTDETRTransformerv2.num_layers
        self.core = RTDETRv2Core(cfg=dict(cfg), dtype=self.dtype)
        self._fwd = jax.jit(partial(self._forward, self))

    @staticmethod
    def _forward(self, params, images):
        if images.dtype == jnp.uint8:
            # Device-side [0,1] scaling: uint8 tiles upload 4x fewer bytes.
            images = images.astype(self.dtype) * (1.0 / 255.0)
        return self.core.apply(params, images.astype(self.dtype))

    #: stage label for utils.stagetrace accounting (task modules override)
    trace_stage = "rtdetr"

    def forward(self, images: np.ndarray):
        """(B, H, W, 3) standardized float32 ->
        {"pred_logits": (B, Q, C), "pred_boxes": (B, Q, 4)} on device."""
        from ..utils.stagetrace import segment

        with segment(self.trace_stage, "dispatch", nbytes=images.nbytes):
            return self._fwd(self.dparams, self.place_batch(images))

    @staticmethod
    def _forward_from_page(self, params, page, mats, out_hw):
        """Fused device program: crop+resize the page regions (RGB,
        supersampled bilinear ~ the host's crop + cv2 INTER_AREA) and run
        the detector — the shared page buffer never leaves the device."""
        from ..ops.separable_resize import sample_regions_separable

        x = sample_regions_separable(page, mats, out_hw, flip_bgr=True)
        x = x.astype(self.dtype) * (1.0 / 255.0)
        return self.core.apply(params, x)

    def forward_from_page(self, page, mats, out_hw):
        """uint8 device page + (B, 3, 3) region maps -> detector outputs
        (device arrays, same contract as forward())."""
        from ..utils.stagetrace import segment

        if not hasattr(self, "_fwd_page"):
            self._fwd_page = jax.jit(
                partial(self._forward_from_page, self), static_argnums=(3,)
            )
        with segment(self.trace_stage, "dispatch"):
            return self._fwd_page(
                self.dparams, page, jnp.asarray(mats), tuple(out_hw)
            )

    def init_params(self, seed: int = 0):
        from .base import on_host_cpu

        h, w = self.cfg.data.img_size
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        with on_host_cpu():
            variables = jax.jit(self.core.init)(jax.random.PRNGKey(seed), dummy)
            return jax.tree.map(np.asarray, variables)

    def convert_torch_state_dict(self, sd: dict):
        from .weights_convert import convert_rtdetr

        return convert_rtdetr(sd, self)
