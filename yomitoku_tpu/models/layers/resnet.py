"""ResNet backbone (inference-form), TPU-native NHWC.

Re-design of the torchvision resnet50 used by the reference DBNet
(yomitoku/models/dbnet_plus.py:30-38: ``replace_stride_with_dilation=
[False, False, True]``, multi-scale features layer1..layer4) and the
PResNet used by RT-DETR.  Inference-only, so BatchNorm is a frozen affine
transform (mean/var/scale/bias stored as params, never updated) — XLA
folds it straight into the preceding convolution.

Feature strides with dilation: layer1 /4, layer2 /8, layer3 /16,
layer4 /16 (3x3 convs dilated 2x instead of strided).
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """y = (x - mean) / sqrt(var + eps) * scale + bias with all four as
    non-trainable params (torch BatchNorm2d in eval mode)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        mul = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * mul + add


def conv(features, kernel, stride=1, dilation=1, name=None, dtype=jnp.float32):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        out = conv(self.planes, 1, name="conv1", dtype=dt)(x)
        out = nn.relu(FrozenBatchNorm(self.planes, dtype=dt, name="bn1")(out))
        out = conv(
            self.planes, 3, self.stride, self.dilation, name="conv2", dtype=dt
        )(out)
        out = nn.relu(FrozenBatchNorm(self.planes, dtype=dt, name="bn2")(out))
        out = conv(self.planes * 4, 1, name="conv3", dtype=dt)(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=dt, name="bn3")(out)
        if self.downsample:
            x = conv(self.planes * 4, 1, self.stride, name="downsample_conv", dtype=dt)(x)
            x = FrozenBatchNorm(self.planes * 4, dtype=dt, name="downsample_bn")(x)
        return nn.relu(out + x)


class ResNetFeatures(nn.Module):
    """torchvision-style ResNet returning {layer1..layer4} NHWC features."""

    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50
    dilate_last: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(
            64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=dt, param_dtype=jnp.float32, name="conv1",
        )(x)
        x = nn.relu(FrozenBatchNorm(64, dtype=dt, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        planes = 64
        dilation = 1
        for li, blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            if li == 3 and self.dilate_last:
                # torchvision replace_stride_with_dilation: first block
                # keeps the previous dilation, later blocks dilate.
                prev_dilation = dilation
                dilation *= stride
                stride = 1
            else:
                prev_dilation = dilation
            for bi in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    dilation=prev_dilation if bi == 0 else dilation,
                    downsample=bi == 0,
                    dtype=dt,
                    name=f"layer{li + 1}_{bi}",
                )(x)
            feats[f"layer{li + 1}"] = x
            planes *= 2
        return feats
