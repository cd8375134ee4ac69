"""DBNet+ text detector, TPU-native.

Re-design of the reference DBNet (yomitoku/models/dbnet_plus.py:233:
dilated ResNet-50 -> FPN-ish decoder -> ScaleFeatureSelection attention ->
binarize head) as one jitted NHWC XLA program per input bucket.  The
adaptive-threshold head exists in checkpoints (adaptive=True serial=True)
but inference only consumes the binary map (dbnet_plus.py:227-229), so we
skip computing it entirely.

Output: full-resolution probability map (B, H, W) float32; thresholding /
contour extraction happen in the postprocessor.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .base import JaxModel, default_compute_dtype
from .layers.resnet import BNParams, FrozenBatchNorm, ResNetFeatures


def _resize_bilinear(x, h, w):
    """torch F.interpolate(..., mode='bilinear', align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


class ConvBNReLU(nn.Module):
    features: int
    kernel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        return nn.relu(FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x))


class ScaleChannelSpatialAttention(nn.Module):
    """Reference models/layers/dbnet_feature_attention.py:36-81."""

    in_planes: int
    out_planes: int
    num_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        dt = self.dtype
        c1 = lambda f, name: nn.Conv(
            f, (1, 1), use_bias=False, dtype=dt, param_dtype=jnp.float32, name=name
        )
        # channel-wise: GAP -> 1x1 -> relu -> 1x1, sigmoid
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = c1(self.out_planes, "cw_fc1")(g)
        g = nn.relu(g)
        g = c1(self.in_planes, "cw_fc2")(g)
        g = nn.sigmoid(g) + x
        # spatial-wise over the channel mean
        m = jnp.mean(g, axis=3, keepdims=True)
        s = nn.Conv(
            1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=dt, param_dtype=jnp.float32, name="sw_conv1",
        )(m)
        s = nn.relu(s)
        s = c1(1, "sw_conv2")(s)
        g = nn.sigmoid(s) + g
        # per-scale attention logits
        a = c1(self.num_features, "attn")(g)
        return nn.sigmoid(a)  # (B, H, W, num_features)


class ScaleFeatureSelection(nn.Module):
    """Reference dbnet_feature_attention.py:118-166 (scale_channel_spatial)."""

    in_channels: int
    inter_channels: int
    out_features_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, concat_x, features_list):
        x = nn.Conv(
            self.inter_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(concat_x)
        score = ScaleChannelSpatialAttention(
            self.inter_channels, self.inter_channels // 4, self.out_features_num,
            dtype=self.dtype, name="enhanced_attention",
        )(x)
        parts = [
            score[..., i : i + 1] * features_list[i]
            for i in range(self.out_features_num)
        ]
        return jnp.concatenate(parts, axis=-1)


def _use_packed_head(x) -> bool:
    """Depth-packed binarize head: TPU only (the module path is the
    exact-parity reference on CPU, and the packed wire format needs the
    host-side unpack)."""
    import os

    if os.environ.get("YOMITOKU_TPU_NO_PACKED_HEAD"):
        return False
    return jax.default_backend() == "tpu"


class _ConvTParams(nn.Module):
    """Raw kernel/bias with nn.ConvTranspose's param tree layout (the
    fused head consumes the arrays directly; checkpoints keep the exact
    "bin_up1/kernel" etc. paths)."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, self.features_in, self.features_out),
            jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features_out,), jnp.float32
        )
        return k, b


class DBNetDecoder(nn.Module):
    """FPN decoder + attention fuse + binarize head (dbnet_plus.py:41-230).

    ``packed_head``: emit the probability map depth-packed at /4
    resolution ((B, H4, W4, 16), TPU wire format) instead of the
    full-resolution (B, H, W, 1) map — see ops/dbnet_head.py."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    packed_head: bool = False

    @nn.compact
    def __call__(self, feats):
        dt = self.dtype
        d = self.hidden_dim
        layers = ["layer1", "layer2", "layer3", "layer4"]
        proj = {}
        for name in layers:
            proj[name] = nn.Conv(
                d, (1, 1), use_bias=False, dtype=dt, param_dtype=jnp.float32,
                name=f"input_proj_{name}",
            )(feats[name])

        # top-down pathway: layer4 -> layer1, resize-to-match then add
        for top, bottom in (("layer3", "layer4"), ("layer2", "layer3"),
                            ("layer1", "layer2")):
            b = proj[bottom]
            t = proj[top]
            if b.shape[1:3] != t.shape[1:3]:
                b = _resize_bilinear(b, t.shape[1], t.shape[2])
            proj[top] = b + t

        h1, w1 = proj["layer1"].shape[1:3]
        outs = {}
        for name in layers:
            o = nn.Conv(
                d // 4, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                dtype=dt, param_dtype=jnp.float32, name=f"out_proj_{name}",
            )(proj[name])
            if o.shape[1:3] != (h1, w1):
                o = _resize_bilinear(o, h1, w1)
            outs[name] = o

        # channel order layer4..layer1 (reference fp[::-1])
        fp = [outs["layer4"], outs["layer3"], outs["layer2"], outs["layer1"]]
        fuse = jnp.concatenate(fp, axis=-1)
        fuse = ScaleFeatureSelection(
            d, d // 4, dtype=dt, name="concat_attention"
        )(fuse, fp)

        # binarize head: conv-bn-relu, convT x2 (bn relu), convT x2, sigmoid
        x = ConvBNReLU(d // 4, 3, dtype=dt, name="bin0")(fuse)
        if self.packed_head and _use_packed_head(x):
            # Depth-packed head: the stride-2 2x2 transposed convs have
            # no cross-pixel support, so the upsampling collapses to two
            # plain matmuls emitting a (H/4, W/4, 16) map — the
            # full-res interleave is layout-hostile on TPU and happens
            # on the host instead (native depth_to_space_u8).
            from ..ops.dbnet_head import (
                pack_binarize_head_params,
                packed_binarize_head,
            )

            C = d // 4
            k1, bias1 = _ConvTParams(C, C, name="bin_up1")()
            bn = BNParams(C, name="bin_bn1")()
            k2, bias2 = _ConvTParams(C, 1, name="bin_up2")()
            w1, b1, w2, b2 = pack_binarize_head_params(
                k1, bias1, *bn, k2, bias2, dtype=dt
            )
            return packed_binarize_head(x, w1, b1, w2, b2)
        x = nn.ConvTranspose(
            d // 4, (2, 2), strides=(2, 2), use_bias=True,
            dtype=dt, param_dtype=jnp.float32, name="bin_up1",
        )(x)
        x = nn.relu(FrozenBatchNorm(d // 4, dtype=dt, name="bin_bn1")(x))
        x = nn.ConvTranspose(
            1, (2, 2), strides=(2, 2), use_bias=True,
            dtype=dt, param_dtype=jnp.float32, name="bin_up2",
        )(x)
        return nn.sigmoid(x.astype(jnp.float32))  # (B, H, W, 1) full res


class DBNetCore(nn.Module):
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    packed_head: bool = False

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) standardized
        feats = ResNetFeatures(dtype=self.dtype, name="backbone")(images)
        return DBNetDecoder(
            self.hidden_dim, dtype=self.dtype,
            packed_head=self.packed_head, name="decoder",
        )(feats)


class DBNet(JaxModel):
    def __init__(self, cfg, dtype=None):
        super().__init__(cfg)
        self.dtype = dtype or default_compute_dtype()
        self.core = DBNetCore(hidden_dim=cfg.decoder.hidden_dim, dtype=self.dtype)
        # u8 wire paths emit the depth-packed /4-res map on TPU (host
        # unpacks); parameters are identical, so both cores share them.
        self.core_packed = DBNetCore(
            hidden_dim=cfg.decoder.hidden_dim, dtype=self.dtype,
            packed_head=True,
        )
        self._fwd = jax.jit(partial(self._forward, self))
        self._fwd_u8 = jax.jit(partial(self._forward_u8, self))
        self._fwd_page = jax.jit(
            partial(self._forward_from_page, self), static_argnums=(3,)
        )

    @staticmethod
    def _forward(self, params, images):
        return self.core.apply(params, images.astype(self.dtype))[..., 0]

    @staticmethod
    def _forward_u8(self, params, images_u8):
        """uint8 resized page -> prob map, with ImageNet standardization
        fused on device.  Channel order note: the reference flips BGR->RGB
        in preprocess AND standardization flips again
        (yomitoku/text_detector.py:99-107 + data/functions.py:230), so the
        net input is BGR with RGB-ordered mean/std — both flips cancel and
        the u8 image is normalized as-is.  Device-side normalize means the
        host uploads 4x fewer bytes and skips two float passes."""
        from ..data.functions import IMAGENET_MEAN, IMAGENET_STD

        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
        inv = 1.0 / (jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0)
        x = (images_u8.astype(jnp.float32) - mean) * inv
        prob = self.core_packed.apply(params, x.astype(self.dtype))
        if prob.shape[-1] == 1:  # packed head gated off: full-res map
            prob = prob[..., 0]
        # quantize the map to uint8 for the wire (4x less than float32;
        # readback bandwidth is ~44 MB/s on this platform).  <=1/510
        # probability quantization vs the 0.3/0.4 thresholds.
        return jnp.clip(jnp.rint(prob * 255.0), 0, 255).astype(jnp.uint8)

    @staticmethod
    def _forward_from_page(self, params, page, mat, out_hw):
        """Fused device program: resize the uint8 page (2x2-supersampled
        bilinear ~ cv2 INTER_AREA) + standardize + DBNet forward.  The
        page buffer is shared with the other modules — only the prob map
        crosses back to the host."""
        from ..ops.separable_resize import sample_regions_separable

        x = sample_regions_separable(page, mat, out_hw, flip_bgr=False)
        from ..data.functions import IMAGENET_MEAN, IMAGENET_STD

        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
        inv = 1.0 / (jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0)
        x = (x - mean) * inv
        prob = self.core_packed.apply(params, x.astype(self.dtype))
        if prob.shape[-1] == 1:
            prob = prob[..., 0]
        return jnp.clip(jnp.rint(prob * 255.0), 0, 255).astype(jnp.uint8)

    @staticmethod
    def _unpack_u8(out: np.ndarray) -> np.ndarray:
        """Depth-packed (B, H4, W4, 16) u8 wire map -> (B, H, W); a
        full-res (B, H, W) map passes through.  The unpack runs in the
        native C++ (memcpy speed) with a strided-numpy fallback."""
        if out.ndim != 4:
            return out
        try:
            from ..native import depth_to_space_u8

            return np.stack([depth_to_space_u8(p) for p in out])
        except Exception:
            B, H4, W4, _ = out.shape
            full = np.empty((B, 4 * H4, 4 * W4), np.uint8)
            for yo in range(4):
                for xo in range(4):
                    full[:, yo::4, xo::4] = out[..., yo * 4 + xo]
            return full

    #: stage label for utils.stagetrace accounting
    trace_stage = "det"

    def forward_binary_from_page(self, page, src_hw, out_hw, as_u8=False):
        """uint8 device page (padded) -> (1, oh, ow) prob map; src_hw is
        the original (unpadded) page size.  ``as_u8=True`` returns the u8
        wire map (value = prob*255) without the host float conversion —
        75+ ms for a 1280x960 page on a 1-core host; the native
        postprocessor and the visualizer consume it directly."""
        from ..ops.device_crop import staged_page_mat
        from ..utils.stagetrace import segment

        mat = staged_page_mat(tuple(src_hw), tuple(out_hw))
        with segment(self.trace_stage, "dispatch"):
            out = self._fwd_page(self.dparams, page, mat, tuple(out_hw))
        with segment(self.trace_stage, "sync", nbytes=out.nbytes):
            out = np.asarray(out)
        with segment(self.trace_stage, "unpack"):
            out = self._unpack_u8(out)
            if as_u8:
                return out
            return out.astype(np.float32) * (1.0 / 255.0)

    def forward_binary(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) standardized float32 -> (B, H, W) prob map."""
        return np.asarray(self._fwd(self.dparams, self.place_batch(images)))

    def forward_binary_u8(self, images_u8: np.ndarray, as_u8=False) -> np.ndarray:
        """(B, H, W, 3) uint8 (resized, BGR) -> (B, H, W) prob map
        (float32, or the u8 wire map with ``as_u8=True`` — see
        forward_binary_from_page)."""
        from ..utils.stagetrace import segment

        with segment(self.trace_stage, "dispatch",
                     nbytes=images_u8.nbytes):
            out = self._fwd_u8(self.dparams, self.place_batch(images_u8))
        with segment(self.trace_stage, "sync", nbytes=out.nbytes):
            out = np.asarray(out)
        with segment(self.trace_stage, "unpack"):
            out = self._unpack_u8(out)
            if as_u8:
                return out
            return out.astype(np.float32) * (1.0 / 255.0)

    def init_params(self, seed: int = 0):
        from .base import on_host_cpu

        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        with on_host_cpu():
            variables = jax.jit(self.core.init)(jax.random.PRNGKey(seed), dummy)
            return jax.tree.map(np.asarray, variables)

    def convert_torch_state_dict(self, sd: dict):
        from .weights_convert import convert_dbnet

        return convert_dbnet(sd, self)
