"""Parity tests for the fused Pallas attention kernel (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from yomitoku_tpu.ops.pallas.flash_attention import (
    fused_attention,
    fused_attention_reference,
)


@pytest.mark.parametrize(
    "B,H,Lq,Lk,Dh",
    [
        (2, 3, 400, 400, 64),   # ViT encoder shape (L=400 non-128-aligned)
        (1, 8, 300, 300, 32),   # RT-DETR decoder self-attn
        (2, 2, 101, 400, 64),   # PARSeq refine cross-attn
        (1, 1, 128, 128, 128),  # exactly aligned
        (1, 2, 7, 5, 16),       # tiny ragged
    ],
)
def test_fused_attention_matches_reference(B, H, Lq, Lk, Dh):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, Lq, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Lk, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Lk, Dh).astype(np.float32))

    out = fused_attention(q, k, v, interpret=True)
    ref = fused_attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fused_attention_bf16():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 2, 64, 96, ).astype(np.float32)).astype(
        jnp.bfloat16
    ).reshape(2, 2, 64, 96)
    k = jnp.asarray(rng.randn(2, 2, 80, 96).astype(np.float32)).astype(
        jnp.bfloat16
    )
    v = jnp.asarray(rng.randn(2, 2, 80, 96).astype(np.float32)).astype(
        jnp.bfloat16
    )
    out = fused_attention(q, k, v, interpret=True)
    ref = fused_attention_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref, np.float32),
        atol=3e-2,
        rtol=3e-2,
    )


def test_custom_scale():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 1, 32, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 32, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1, 32, 16).astype(np.float32))
    out = fused_attention(q, k, v, scale=0.5, interpret=True)
    ref = fused_attention_reference(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_block_matches_reference():
    # conftest pins CPU + highest matmul precision -> tight tolerance
    rng = np.random.RandomState(3)
    B, L, D, H = 2, 48, 96, 3
    from yomitoku_tpu.ops.pallas.flash_attention import fused_attention_block

    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    ws = [jnp.asarray((rng.randn(D, D) * 0.1).astype(np.float32)) for _ in range(4)]
    bs = [jnp.asarray((rng.randn(D) * 0.02).astype(np.float32)) for _ in range(4)]

    q = x @ ws[0] + bs[0]
    k = x @ ws[1] + bs[1]
    v = x @ ws[2] + bs[2]

    def split(t):
        return t.reshape(B, L, H, D // H).transpose(0, 2, 1, 3)

    o = fused_attention_reference(split(q), split(k), split(v))
    o = np.asarray(o).transpose(0, 2, 1, 3).reshape(B, L, D)
    ref = o @ np.asarray(ws[3]) + np.asarray(bs[3])

    out = fused_attention_block(
        x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3], H,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=5e-5)
