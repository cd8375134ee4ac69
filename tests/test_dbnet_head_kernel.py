"""Depth-packed DBNet binarize head: parity vs the unfused
ConvT->BN->relu->ConvT->sigmoid module pipeline, and the host-side
depth-to-space unpack (native C++ vs numpy fallback)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow
import jax.numpy as jnp  # noqa: E402


def _params(rng, C):
    return dict(
        k1=(rng.randn(2, 2, C, C) * 0.1).astype(np.float32),
        bias1=(rng.randn(C) * 0.05).astype(np.float32),
        bn_scale=(rng.rand(C) + 0.5).astype(np.float32),
        bn_bias=(rng.randn(C) * 0.1).astype(np.float32),
        bn_mean=(rng.randn(C) * 0.1).astype(np.float32),
        bn_var=(rng.rand(C) + 0.5).astype(np.float32),
        k2=(rng.randn(2, 2, C, 1) * 0.1).astype(np.float32),
        bias2=rng.randn(1).astype(np.float32),
    )


def test_packed_binarize_head_matches_module_pipeline():
    from yomitoku_tpu.ops.dbnet_head import (
        binarize_head_reference,
        depth_to_space,
        pack_binarize_head_params,
        packed_binarize_head,
    )

    rng = np.random.RandomState(0)
    B, H4, W4, C = 2, 16, 24, 32
    x = rng.randn(B, H4, W4, C).astype(np.float32)
    p = {k: jnp.asarray(v) for k, v in _params(rng, C).items()}

    ref = np.asarray(binarize_head_reference(jnp.asarray(x), **p))

    w1, b1, w2, b2 = pack_binarize_head_params(
        p["k1"], p["bias1"], p["bn_scale"], p["bn_bias"], p["bn_mean"],
        p["bn_var"], p["k2"], p["bias2"], dtype=jnp.float32,
    )
    packed = packed_binarize_head(jnp.asarray(x), w1, b1, w2, b2)
    out = np.asarray(depth_to_space(packed))

    assert out.shape == (B, 4 * H4, 4 * W4)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_depth_to_space_u8_native_matches_numpy():
    from yomitoku_tpu.models.dbnet import DBNet

    rng = np.random.RandomState(1)
    pk = rng.randint(0, 256, (2, 16, 24, 16), np.uint8)
    full = DBNet._unpack_u8(pk)
    ref = np.empty((2, 64, 96), np.uint8)
    for yo in range(4):
        for xo in range(4):
            ref[:, yo::4, xo::4] = pk[..., yo * 4 + xo]
    np.testing.assert_array_equal(full, ref)
    # jnp reference agrees too
    from yomitoku_tpu.ops.dbnet_head import depth_to_space

    np.testing.assert_array_equal(np.asarray(depth_to_space(pk)), ref)
    # full-res maps pass through untouched
    fr = rng.randint(0, 256, (1, 64, 96), np.uint8)
    np.testing.assert_array_equal(DBNet._unpack_u8(fr), fr)


def test_dbnet_packed_core_matches_module_core():
    """The packed core (forced on) reproduces the module core's prob map
    after depth-to-space (identical params, same math)."""
    import os

    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.models.dbnet import DBNetCore
    from yomitoku_tpu.ops.dbnet_head import depth_to_space

    cfg = structured(TextDetectorDBNetV2_1Config)
    rng = np.random.RandomState(2)
    x = rng.rand(1, 64, 96, 3).astype(np.float32)

    core = DBNetCore(hidden_dim=cfg.decoder.hidden_dim)
    params = core.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = np.asarray(core.apply(params, jnp.asarray(x)))[..., 0]

    packed_core = DBNetCore(
        hidden_dim=cfg.decoder.hidden_dim, packed_head=True
    )
    os.environ.pop("YOMITOKU_TPU_NO_PACKED_HEAD", None)
    import yomitoku_tpu.models.dbnet as dbnet_mod

    orig = dbnet_mod._use_packed_head
    dbnet_mod._use_packed_head = lambda x: True
    try:
        packed = np.asarray(packed_core.apply(params, jnp.asarray(x)))
    finally:
        dbnet_mod._use_packed_head = orig
    assert packed.shape[-1] == 16
    out = np.asarray(depth_to_space(jnp.asarray(packed)))
    np.testing.assert_allclose(out, full, atol=1e-5, rtol=1e-5)
