"""Parity tests for the Pallas multi-scale deformable attention kernel
against the jnp gather reference (which itself is parity-tested against
torch F.grid_sample in test_rtdetr_torch_parity.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from yomitoku_tpu.models.layers.rtdetr_decoder import (
    bilinear_sample_zeros,  # noqa: F401  (sanity import)
    deformable_attention_core,
)
from yomitoku_tpu.ops.pallas.deformable_attention import ms_deformable_attention

SHAPES = ((80, 80), (40, 40), (20, 20))


def _rand_inputs(B, Lq, nh, c, P_list, seed=0, oob=True):
    rng = np.random.RandomState(seed)
    L = sum(h * w for h, w in SHAPES)
    P = sum(P_list)
    value = rng.randn(B, L, nh, c).astype(np.float32)
    # locations mostly in [0,1]; some out of bounds to exercise masking
    loc = rng.rand(B, Lq, nh, P, 2).astype(np.float32)
    if oob:
        loc = loc * 1.3 - 0.15
    att = rng.rand(B, Lq, nh, P).astype(np.float32)
    att = att / att.sum(-1, keepdims=True)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(att)


@pytest.mark.parametrize("Lq,P_list", [(300, (4, 4, 4)), (40, (4, 2, 1))])
def test_kernel_matches_gather_reference(Lq, P_list):
    value, loc, att = _rand_inputs(1, Lq, 2, 32, P_list)
    ref = deformable_attention_core(value, SHAPES, loc, att, list(P_list))
    out = ms_deformable_attention(
        value, loc, att, SHAPES, tuple(P_list), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_kernel_query_tiling():
    # Lq > 512 exercises the query-tile path (cell detector uses 2500).
    value, loc, att = _rand_inputs(1, 600, 2, 16, (4, 4, 4), seed=1)
    ref = deformable_attention_core(value, SHAPES, loc, att, [4, 4, 4])
    out = ms_deformable_attention(
        value, loc, att, SHAPES, (4, 4, 4), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_kernel_bf16():
    value, loc, att = _rand_inputs(1, 64, 2, 32, (4, 4, 4), seed=2)
    ref = deformable_attention_core(
        value.astype(jnp.bfloat16), SHAPES, loc, att, [4, 4, 4]
    )
    out = ms_deformable_attention(
        value.astype(jnp.bfloat16), loc, att, SHAPES, (4, 4, 4),
        interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )
