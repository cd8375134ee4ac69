"""Whole-stage fused ResNet kernel (ops/pallas/stage.py) vs N composed
reference bottlenecks — interpret mode on CPU, incl. edge strips (top /
bottom halo masking) and dilation 2."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow
import jax.numpy as jnp  # noqa: E402

from yomitoku_tpu.ops.pallas.bottleneck import bottleneck_reference  # noqa: E402
from yomitoku_tpu.ops.pallas.stage import fused_identity_stage, stage_th  # noqa: E402


def _weights(rng, N, C, Cm):
    s = 1.0 / np.sqrt(C)
    return (
        jnp.asarray(rng.randn(N, C, Cm) * s, jnp.float32),
        jnp.asarray(rng.randn(N, Cm) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(N, 9, Cm, Cm) * s, jnp.float32),
        jnp.asarray(rng.randn(N, Cm) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(N, Cm, C) * s, jnp.float32),
        jnp.asarray(rng.randn(N, C) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("N,d,H,W", [(2, 1, 32, 16), (3, 1, 24, 8), (2, 2, 32, 8)])
def test_stage_matches_composed_blocks(N, d, H, W):
    C, Cm = 128, 32
    rng = np.random.RandomState(0)
    w1s, b1s, w2s, b2s, w3s, b3s = _weights(rng, N, C, Cm)
    x = jnp.asarray(rng.randn(2, H, W, C), jnp.float32)

    assert stage_th(H, W, C, Cm, N, d) is not None
    got = fused_identity_stage(
        x, w1s, b1s, w2s, b2s, w3s, b3s, dilation=d, interpret=True
    )

    want = x
    for j in range(N):
        want = bottleneck_reference(
            want, w1s[j], b1s[j], w2s[j], b2s[j], w3s[j], b3s[j], dilation=d
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_unsupported_shape_falls_back():
    C, Cm = 128, 32
    rng = np.random.RandomState(1)
    w = _weights(rng, 2, C, Cm)
    x = jnp.asarray(rng.randn(1, 12, 8, C), jnp.float32)  # H % 8 != 0
    got = fused_identity_stage(x, *w, dilation=1, interpret=True)
    want = x
    for j in range(2):
        want = bottleneck_reference(
            want, *(a[j] for a in w), dilation=1
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_in_model_gate_interpret(monkeypatch):
    """ResNetFeatures routes stage tails through the fused kernel when
    gated (=interpret on CPU) and matches the block-by-block path."""
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.models.dbnet import DBNet

    det = DBNet(structured(TextDetectorDBNetV2_1Config))
    det.params = det.init_params(0)
    x = np.random.RandomState(0).randint(0, 255, (1, 64, 96, 3), np.uint8)
    base = det.forward_binary_u8(x)

    monkeypatch.setenv("YOMITOKU_TPU_FUSED_STAGE", "interpret")
    det2 = DBNet(structured(TextDetectorDBNetV2_1Config))
    det2.params = det.params
    fused = det2.forward_binary_u8(x)
    np.testing.assert_allclose(fused, base, atol=3e-2)
    assert np.abs(fused - base).mean() < 2e-3
