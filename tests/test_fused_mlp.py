"""Parity tests for the fused Pallas MLP kernel (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yomitoku_tpu.ops.pallas.fused_mlp import fused_mlp, fused_mlp_reference


@pytest.mark.parametrize(
    "N,D,H",
    [
        (1024, 128, 512),   # chunked hidden (512 % 128 == 0)
        (512, 256, 1024),
        (96, 64, 128),      # single chunk, small tile
    ],
)
def test_fused_mlp_matches_reference(N, D, H):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, D).astype(np.float32))
    w1 = jnp.asarray((rng.randn(D, H) * 0.05).astype(np.float32))
    b1 = jnp.asarray((rng.randn(H) * 0.02).astype(np.float32))
    w2 = jnp.asarray((rng.randn(H, D) * 0.05).astype(np.float32))
    b2 = jnp.asarray((rng.randn(D) * 0.02).astype(np.float32))
    out = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    ref = fused_mlp_reference(x, w1, b1, w2, b2)
    # the kernel's erf is the A&S 7.1.26 rational approximation
    # (|err| <= 1.5e-7); tolerance covers its propagation through fc2
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4
    )


def test_fused_mlp_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(256, 128).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.randn(128, 256) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    b1 = jnp.zeros((256,), jnp.bfloat16)
    w2 = jnp.asarray((rng.randn(256, 128) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    b2 = jnp.zeros((128,), jnp.bfloat16)
    out = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    ref = fused_mlp_reference(x, w1, b1, w2, b2)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )
