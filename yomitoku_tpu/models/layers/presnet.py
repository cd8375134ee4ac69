"""PResNet backbone (ResNet-d variant) for RT-DETRv2, NHWC flax.

Re-design of the reference rtdetr_backbone.py:245 (PResNet): stem of three
3x3 convs (variant c/d), bottleneck stages with avgpool-downsample
shortcuts (variant d), frozen BatchNorm (inference form).  Returns the
features at ``return_idx`` stages.
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet import FrozenBatchNorm

_ACTS = {
    None: lambda x: x,
    "relu": nn.relu,
    "silu": nn.silu,
    # exact erf form — torch nn.GELU()'s default; flax's default tanh
    # approximation costs ~1e-3 of activation parity for no TPU win
    "gelu": lambda x: nn.gelu(x, approximate=False),
}


class ConvNorm(nn.Module):
    """conv + frozen BN + activation (reference ConvNormLayer)."""

    features: int
    kernel: int
    stride: int = 1
    act: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="norm")(x)
        return _ACTS[self.act](x)


def _avg_pool_2x2_ceil(x):
    """torch AvgPool2d(2, 2, 0, ceil_mode=True): pad bottom/right when odd,
    divisor is the true window overlap (count_include_pad=True counts only
    within the padded extent, but with padding=0 ceil_mode windows clip to
    the input, so divide by the actual window size)."""
    h, w = x.shape[1:3]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        ones = jnp.pad(jnp.ones((1, h, w, 1), x.dtype), ((0, 0), (0, ph), (0, pw), (0, 0)))
        s = nn.avg_pool(x, (2, 2), (2, 2), count_include_pad=True)
        n = nn.avg_pool(ones, (2, 2), (2, 2), count_include_pad=True)
        return s / n
    return nn.avg_pool(x, (2, 2), (2, 2))


class _ConvNormParams(nn.Module):
    """Raw conv kernel + FrozenBN params with ConvNorm's tree layout."""

    shape: tuple

    @nn.compact
    def __call__(self):
        from .resnet import BNParams, ConvParams

        k = ConvParams(self.shape, name="conv")()
        bn = BNParams(self.shape[-1], name="norm")()
        return k, bn


class PBottleneck(nn.Module):
    ch_out: int
    stride: int
    shortcut: bool
    variant: str = "d"
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        w = self.ch_out
        Cin = x.shape[-1]
        from .resnet import use_fused_bottleneck

        if self.act == "relu" and use_fused_bottleneck(
            x, self.stride, Cin, w, w * 4, 1
        ):
            from ...ops.pallas.bottleneck import fold_bn, fused_bottleneck

            k1, bn1 = _ConvNormParams((1, 1, Cin, w), name="branch2a")()
            k2, bn2 = _ConvNormParams((3, 3, w, w), name="branch2b")()
            k3, bn3 = _ConvNormParams((1, 1, w, w * 4), name="branch2c")()
            m1, a1 = fold_bn(*bn1)
            m2, a2 = fold_bn(*bn2)
            m3, a3 = fold_bn(*bn3)
            wd = bd = None
            if not self.shortcut:  # stride-1 variant-d: 1x1 projection
                kd, bnd = _ConvNormParams(
                    (1, 1, Cin, w * 4), name="short_conv"
                )()
                md, ad = fold_bn(*bnd)
                wd = (kd[0, 0] * md).astype(dt)
                bd = ad
            return fused_bottleneck(
                x.astype(dt),
                (k1[0, 0] * m1).astype(dt), a1,
                (k2.reshape(9, w, w) * m2).astype(dt), a2,
                (k3[0, 0] * m3).astype(dt), a3,
                wd, bd, dilation=1,
            )
        out = ConvNorm(w, 1, 1, act=self.act, dtype=dt, name="branch2a")(x)
        out = ConvNorm(w, 3, self.stride, act=self.act, dtype=dt, name="branch2b")(out)
        out = ConvNorm(w * 4, 1, 1, act=None, dtype=dt, name="branch2c")(out)
        if self.shortcut:
            short = x
        elif self.variant == "d" and self.stride == 2:
            short = _avg_pool_2x2_ceil(x)
            short = ConvNorm(w * 4, 1, 1, act=None, dtype=dt, name="short_conv")(short)
        else:
            short = ConvNorm(
                w * 4, 1, self.stride, act=None, dtype=dt, name="short_conv"
            )(x)
        return _ACTS[self.act](out + short)


class PResNet(nn.Module):
    depth: int = 50
    variant: str = "d"
    return_idx: Sequence[int] = (1, 2, 3)
    num_stages: int = 4
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32
    # freeze_at / freeze_norm accepted via config but moot at inference.

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        assert self.depth == 50, "only resnet50-d wired up (all configs use it)"
        block_nums = (3, 4, 6, 3)
        dt = self.dtype
        x = x.astype(dt)
        # variant-d stem: three 3x3 convs
        x = ConvNorm(32, 3, 2, act=self.act, dtype=dt, name="conv1_1")(x)
        x = ConvNorm(32, 3, 1, act=self.act, dtype=dt, name="conv1_2")(x)
        x = ConvNorm(64, 3, 1, act=self.act, dtype=dt, name="conv1_3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        ch_out = 64
        for si in range(self.num_stages):
            for bi in range(block_nums[si]):
                x = PBottleneck(
                    ch_out,
                    stride=2 if bi == 0 and si != 0 else 1,
                    shortcut=bi != 0,
                    variant=self.variant,
                    act=self.act,
                    dtype=dt,
                    name=f"stage{si}_{bi}",
                )(x)
            if si in self.return_idx:
                outs.append(x)
            ch_out *= 2
        return outs
