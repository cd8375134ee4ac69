"""W8A8 encoder sublayer kernels: interpret-mode parity within
quantization noise vs the float pre-LN composition."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.perf_optin
import jax.numpy as jnp  # noqa: E402


def _ln(x, g, b, eps=1e-6):
    xf = x.astype(np.float32)
    mu = xf.mean(-1, keepdims=True)
    var = np.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
    return (xf - mu) / np.sqrt(var + eps) * g + b


def test_quantize_weight_int8_roundtrip():
    from yomitoku_tpu.ops.pallas.fused_mlp import quantize_weight_int8

    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32) * 2.0
    q, s = quantize_weight_int8(jnp.asarray(w))
    assert q.dtype == jnp.int8 and s.shape == (32,)
    w_hat = np.asarray(q, np.float32) * np.asarray(s)
    assert np.all(np.abs(w_hat - w) <= np.asarray(s) * 0.5 + 1e-6)


def test_fused_mlp_ln_int8_close_to_float():
    from yomitoku_tpu.ops.pallas.fused_mlp import (
        fused_mlp_ln,
        fused_mlp_ln_int8,
        quantize_weight_int8,
    )

    rng = np.random.RandomState(1)
    N, D, H = 16, 64, 256
    x = rng.randn(N, D).astype(np.float32)
    g = rng.rand(D).astype(np.float32) + 0.5
    b = rng.randn(D).astype(np.float32) * 0.1
    w1 = rng.randn(D, H).astype(np.float32) * 0.1
    b1 = rng.randn(H).astype(np.float32) * 0.05
    w2 = rng.randn(H, D).astype(np.float32) * 0.1
    b2 = rng.randn(D).astype(np.float32) * 0.05

    ref = np.asarray(
        fused_mlp_ln(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
            jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
            jnp.asarray(b2), interpret=True,
        )
    )
    w1q, s1 = quantize_weight_int8(jnp.asarray(w1))
    w2q, s2 = quantize_weight_int8(jnp.asarray(w2))
    out = np.asarray(
        fused_mlp_ln_int8(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
            w1q, s1, jnp.asarray(b1), w2q, s2, jnp.asarray(b2),
            interpret=True,
        )
    )
    # quantization noise scales with the sublayer output magnitude
    scale = np.abs(ref - x).max()
    assert np.abs(out - ref).max() < 0.05 * scale + 1e-3


def test_fused_attention_block_ln_int8_close_to_float():
    from yomitoku_tpu.ops.pallas.flash_attention import (
        fused_attention_block_ln,
        fused_attention_block_ln_int8,
    )
    from yomitoku_tpu.ops.pallas.fused_mlp import quantize_weight_int8

    rng = np.random.RandomState(2)
    B, L, D, H = 2, 24, 64, 4
    x = rng.randn(B, L, D).astype(np.float32)
    g = rng.rand(D).astype(np.float32) + 0.5
    b = rng.randn(D).astype(np.float32) * 0.1
    ws = [rng.randn(D, D).astype(np.float32) * 0.08 for _ in range(4)]
    bs = [rng.randn(D).astype(np.float32) * 0.05 for _ in range(4)]

    ref = np.asarray(
        fused_attention_block_ln(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
            jnp.asarray(ws[0]), jnp.asarray(bs[0]),
            jnp.asarray(ws[1]), jnp.asarray(bs[1]),
            jnp.asarray(ws[2]), jnp.asarray(bs[2]),
            jnp.asarray(ws[3]), jnp.asarray(bs[3]),
            H, interpret=True,
        )
    )
    qw = [quantize_weight_int8(jnp.asarray(w)) for w in ws]
    out = np.asarray(
        fused_attention_block_ln_int8(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
            qw[0][0], qw[0][1], jnp.asarray(bs[0]),
            qw[1][0], qw[1][1], jnp.asarray(bs[1]),
            qw[2][0], qw[2][1], jnp.asarray(bs[2]),
            qw[3][0], qw[3][1], jnp.asarray(bs[3]),
            H, interpret=True,
        )
    )
    scale = np.abs(ref - x).max()
    assert np.abs(out - ref).max() < 0.05 * scale + 1e-3
