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


def use_fused_bottleneck(x, stride, Cin, Cm, Cout, dilation) -> bool:
    """Fused Pallas bottleneck (ops/pallas/bottleneck.py): OPT-IN via
    YOMITOKU_TPU_FUSED_BOTTLENECK=1.  Measured end-to-end SLOWER than
    XLA's native conv path on both backbones (DBNet 7.4 -> 11.2 ms,
    RT-DETR 4.0 -> 6.0 ms): XLA's TPU conv emitter already keeps
    bottleneck chains near bandwidth, and each custom call forces layout
    materialization at its boundary.  Kept for future tuning; the
    standalone kernel does beat an einsum-formulated block by up to 11x,
    which is a statement about the einsum form, not the conv emitter."""
    import os

    import jax

    if os.environ.get("YOMITOKU_TPU_FUSED_BOTTLENECK") != "1":
        return False
    if jax.default_backend() != "tpu" or stride != 1:
        return False
    from ...ops.pallas.bottleneck import bottleneck_th

    return (
        bottleneck_th(x.shape[1], x.shape[2], Cin, Cm, Cout, dilation)
        is not None
    )


class ConvParams(nn.Module):
    """Raw conv kernel with nn.Conv's param tree layout (no bias), for
    feeding the fused bottleneck kernel directly."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class BNParams(nn.Module):
    """Raw FrozenBatchNorm params with the same tree layout."""

    features: int

    @nn.compact
    def __call__(self):
        p = lambda name, init: self.param(
            name, init, (self.features,), jnp.float32
        )
        return (
            p("scale", nn.initializers.ones),
            p("bias", nn.initializers.zeros),
            p("mean", nn.initializers.zeros),
            p("var", nn.initializers.ones),
        )


def use_fused_stage(x, n_blocks, C, Cm, dilation):
    """Whole-stage VMEM kernel gate (ops/pallas/stage.py).  Opt-in:
    YOMITOKU_TPU_FUSED_STAGE=1 (TPU) or =interpret (CPU tests).  Unlike
    the per-block kernel, one call covers a stage's whole stride-1 tail,
    so the custom-call layout boundary amortizes over N blocks."""
    import os

    import jax

    mode = os.environ.get("YOMITOKU_TPU_FUSED_STAGE")
    if mode not in ("1", "interpret"):
        return False
    if mode == "1" and jax.default_backend() != "tpu":
        return False
    from ...ops.pallas.stage import stage_th

    H, W = x.shape[1:3]
    return stage_th(H, W, C, Cm, n_blocks, dilation) is not None


class BottleneckFoldedParams(nn.Module):
    """Declares one identity bottleneck's params under the standard
    names (conv1/bn1/.../conv3/bn3 — same tree paths as ``Bottleneck``,
    so checkpoints are interchangeable) and returns them BN-folded for
    the fused stage kernel."""

    planes: int
    cin: int

    @nn.compact
    def __call__(self):
        from ...ops.pallas.bottleneck import fold_bn

        Cm, C = self.planes, self.planes * 4
        k1 = ConvParams((1, 1, self.cin, Cm), name="conv1")()
        m1, a1 = fold_bn(*BNParams(Cm, name="bn1")())
        k2 = ConvParams((3, 3, Cm, Cm), name="conv2")()
        m2, a2 = fold_bn(*BNParams(Cm, name="bn2")())
        k3 = ConvParams((1, 1, Cm, C), name="conv3")()
        m3, a3 = fold_bn(*BNParams(C, name="bn3")())
        return (
            k1[0, 0] * m1, a1,
            k2.reshape(9, Cm, Cm) * m2, a2,
            k3[0, 0] * m3, a3,
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
        Cin = x.shape[-1]
        Cm, Cout = self.planes, self.planes * 4
        if use_fused_bottleneck(x, self.stride, Cin, Cm, Cout, self.dilation):
            from ...ops.pallas.bottleneck import fold_bn, fused_bottleneck

            k1 = ConvParams((1, 1, Cin, Cm), name="conv1")()
            m1, a1 = fold_bn(*BNParams(Cm, name="bn1")())
            k2 = ConvParams((3, 3, Cm, Cm), name="conv2")()
            m2, a2 = fold_bn(*BNParams(Cm, name="bn2")())
            k3 = ConvParams((1, 1, Cm, Cout), name="conv3")()
            m3, a3 = fold_bn(*BNParams(Cout, name="bn3")())
            wd = bd = None
            if self.downsample:
                kd = ConvParams((1, 1, Cin, Cout), name="downsample_conv")()
                md, ad = fold_bn(*BNParams(Cout, name="downsample_bn")())
                wd = (kd[0, 0] * md).astype(dt)
                bd = ad
            return fused_bottleneck(
                x.astype(dt),
                (k1[0, 0] * m1).astype(dt), a1,
                (k2.reshape(9, Cm, Cm) * m2).astype(dt), a2,
                (k3[0, 0] * m3).astype(dt), a3,
                wd, bd, dilation=self.dilation,
            )
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
            x = Bottleneck(
                planes,
                stride=stride,
                dilation=prev_dilation,
                downsample=True,
                dtype=dt,
                name=f"layer{li + 1}_0",
            )(x)
            if blocks > 1 and use_fused_stage(
                x, blocks - 1, planes * 4, planes, dilation
            ):
                import os

                from ...ops.pallas.stage import fused_identity_stage

                folded = [
                    BottleneckFoldedParams(
                        planes, x.shape[-1], name=f"layer{li + 1}_{bi}"
                    )()
                    for bi in range(1, blocks)
                ]
                stacks = [
                    jnp.stack([f[c] for f in folded]) for c in range(6)
                ]
                w1s, b1s, w2s, b2s, w3s, b3s = stacks
                x = fused_identity_stage(
                    x.astype(dt),
                    w1s.astype(dt), b1s, w2s.astype(dt), b2s,
                    w3s.astype(dt), b3s,
                    dilation=dilation,
                    interpret=os.environ.get("YOMITOKU_TPU_FUSED_STAGE")
                    == "interpret",
                )
            else:
                for bi in range(1, blocks):
                    x = Bottleneck(
                        planes,
                        stride=1,
                        dilation=dilation,
                        downsample=False,
                        dtype=dt,
                        name=f"layer{li + 1}_{bi}",
                    )(x)
            feats[f"layer{li + 1}"] = x
            planes *= 2
        return feats
