"""Pre-LN fused sublayer kernels: x + attn(LN(x)) and x + mlp(LN(x)).

Interpret-mode parity vs the plain jnp composition (the same math the
CPU fallback path runs), pinning the LN statistics, GELU, residual, and
projection semantics of the folded kernels."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _ln(x, g, b, eps=1e-6):
    xf = x.astype(np.float32)
    mu = xf.mean(-1, keepdims=True)
    var = np.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
    return (xf - mu) / np.sqrt(var + eps) * g + b


def test_fused_attention_block_ln_interpret():
    from yomitoku_tpu.ops.pallas.flash_attention import (
        fused_attention_block_ln,
    )

    rng = np.random.RandomState(0)
    B, L, D, H = 2, 24, 64, 4
    x = rng.randn(B, L, D).astype(np.float32)
    g = rng.rand(D).astype(np.float32) + 0.5
    b = rng.randn(D).astype(np.float32) * 0.1
    ws = [rng.randn(D, D).astype(np.float32) * 0.08 for _ in range(4)]
    bs = [rng.randn(D).astype(np.float32) * 0.05 for _ in range(4)]

    out = np.asarray(
        fused_attention_block_ln(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
            jnp.asarray(ws[0]), jnp.asarray(bs[0]),
            jnp.asarray(ws[1]), jnp.asarray(bs[1]),
            jnp.asarray(ws[2]), jnp.asarray(bs[2]),
            jnp.asarray(ws[3]), jnp.asarray(bs[3]),
            H, interpret=True,
        )
    )

    h = _ln(x, g, b)
    q, k, v = (h @ ws[i] + bs[i] for i in range(3))
    Dh = D // H
    attn = np.zeros_like(q)
    for hd in range(H):
        sl = slice(hd * Dh, (hd + 1) * Dh)
        logits = q[..., sl] @ k[..., sl].transpose(0, 2, 1) * Dh**-0.5
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        attn[..., sl] = w @ v[..., sl]
    ref = x + (attn @ ws[3] + bs[3])
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_fused_mlp_ln_interpret():
    from yomitoku_tpu.ops.pallas.fused_mlp import fused_mlp_ln

    rng = np.random.RandomState(1)
    N, D, Hd = 16, 64, 256
    x = rng.randn(N, D).astype(np.float32)
    g = rng.rand(D).astype(np.float32) + 0.5
    b = rng.randn(D).astype(np.float32) * 0.1
    w1 = rng.randn(D, Hd).astype(np.float32) * 0.1
    b1 = rng.randn(Hd).astype(np.float32) * 0.05
    w2 = rng.randn(Hd, D).astype(np.float32) * 0.1
    b2 = rng.randn(D).astype(np.float32) * 0.05

    out = np.asarray(
        fused_mlp_ln(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
            jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
            jnp.asarray(b2), interpret=True,
        )
    )

    from scipy.special import erf

    h = _ln(x, g, b) @ w1 + b1
    gelu = 0.5 * h * (1.0 + erf(h / np.sqrt(2.0)))
    ref = x + (gelu @ w2 + b2)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_encoder_block_matches_manual_composition():
    """The EncoderBlock (pre_ln plumbing, CPU fallback path) equals the
    explicit LN -> sublayer -> residual composition."""
    from yomitoku_tpu.models.layers.vit import EncoderBlock

    rng = np.random.RandomState(2)
    B, L, D = 2, 20, 32
    x = rng.randn(B, L, D).astype(np.float32)
    blk = EncoderBlock(embed_dim=D, num_heads=4, mlp_ratio=2.0)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(blk.apply(params, jnp.asarray(x)))

    p = params["params"]

    def ln(px, name):
        return _ln(px, np.asarray(p[name]["scale"]),
                   np.asarray(p[name]["bias"]))

    def dense(px, sub, name):
        return px @ np.asarray(p[sub][name]["kernel"]) + np.asarray(
            p[sub][name]["bias"]
        )

    h = ln(x, "norm1")
    q, k, v = (dense(h, "attn", f"{n}_proj") for n in ("q", "k", "v"))
    Dh = D // 4
    attn = np.zeros_like(q)
    for hd in range(4):
        sl = slice(hd * Dh, (hd + 1) * Dh)
        logits = q[..., sl] @ k[..., sl].transpose(0, 2, 1) * Dh**-0.5
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        attn[..., sl] = w @ v[..., sl]
    x1 = x + dense(attn, "attn", "out_proj")

    from scipy.special import erf

    h2 = dense(ln(x1, "norm2"), "mlp", "fc1")
    gelu = 0.5 * h2 * (1.0 + erf(h2 / np.sqrt(2.0)))
    ref = x1 + dense(gelu, "mlp", "fc2")
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
