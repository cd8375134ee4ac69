"""Fused ResNet bottleneck kernel: interpret-mode parity vs the plain
jnp composition, covering dilation, shortcut projection, page-edge
zero-padding (top/bottom strips), and multi-strip grids."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.perf_optin
import jax.numpy as jnp  # noqa: E402

from yomitoku_tpu.ops.pallas.bottleneck import (  # noqa: E402
    bottleneck_reference,
    fold_bn,
    fused_bottleneck,
)


def _params(rng, Cin, Cm, Cout, down):
    p = dict(
        w1=(rng.randn(Cin, Cm) * 0.1).astype(np.float32),
        b1=(rng.randn(Cm) * 0.05).astype(np.float32),
        w2=(rng.randn(9, Cm, Cm) * 0.05).astype(np.float32),
        b2=(rng.randn(Cm) * 0.05).astype(np.float32),
        w3=(rng.randn(Cm, Cout) * 0.1).astype(np.float32),
        b3=(rng.randn(Cout) * 0.05).astype(np.float32),
    )
    if down:
        p["wd"] = (rng.randn(Cin, Cout) * 0.1).astype(np.float32)
        p["bd"] = (rng.randn(Cout) * 0.05).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in p.items()}


@pytest.mark.parametrize(
    "H,W,Cin,Cm,Cout,d,down",
    [
        (16, 24, 32, 8, 32, 1, False),   # identity shortcut
        (16, 24, 32, 8, 64, 1, True),    # projection shortcut
        (24, 16, 16, 8, 16, 2, False),   # dilation 2 (DBNet stage4)
        (48, 16, 16, 8, 16, 1, False),   # multiple strips
    ],
)
def test_fused_bottleneck_matches_reference(H, W, Cin, Cm, Cout, d, down):
    rng = np.random.RandomState(H + Cout + d)
    x = jnp.asarray(rng.randn(2, H, W, Cin).astype(np.float32))
    p = _params(rng, Cin, Cm, Cout, down)

    ref = np.asarray(bottleneck_reference(x, dilation=d, **p))
    out = np.asarray(fused_bottleneck(x, dilation=d, interpret=True, **p))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_fold_bn_matches_frozen_batchnorm():
    from yomitoku_tpu.models.layers.resnet import FrozenBatchNorm

    rng = np.random.RandomState(0)
    C = 16
    scale = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(C).astype(np.float32))
    mean = jnp.asarray(rng.randn(C).astype(np.float32))
    var = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    x = jnp.asarray(rng.randn(2, 4, 4, C).astype(np.float32))

    bn = FrozenBatchNorm(C)
    out = bn.apply(
        {"params": {"scale": scale, "bias": bias, "mean": mean, "var": var}},
        x,
    )
    mul, add = fold_bn(scale, bias, mean, var)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x * mul + add), atol=1e-5, rtol=1e-5
    )
