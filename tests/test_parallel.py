"""Multi-device sharding tests on the virtual 8-device CPU mesh
(conftest.py forces JAX_PLATFORMS=cpu with
xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import pytest

from yomitoku_tpu.config import structured
from yomitoku_tpu.parallel import (
    DataParallel,
    dp_pages,
    make_mesh,
    parseq_param_shardings,
    shard_batch,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _tiny_parseq():
    from yomitoku_tpu.configs import TextRecognizerPARSeqTinyConfig
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = structured(TextRecognizerPARSeqTinyConfig)
    cfg.encoder.depth = 1
    cfg.encoder.embed_dim = 32
    cfg.encoder.num_heads = 2
    cfg.decoder.embed_dim = 32
    cfg.decoder.num_heads = 2
    cfg.num_tokens = 16
    cfg.max_label_length = 4
    cfg.data.img_size = [16, 32]
    m = PARSeq(cfg)
    m.params = m.init_params(0)
    return m


def _tiny_dbnet():
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.models.dbnet import DBNet

    m = DBNet(structured(TextDetectorDBNetV2_1Config))
    m.params = m.init_params(0)
    return m


def test_dp_pages_dbnet():
    m = _tiny_dbnet()
    pages = np.random.RandomState(0).rand(5, 64, 64, 3).astype(np.float32)
    out = dp_pages(m, pages, n_devices=8)
    assert out.shape == (5, 64, 64)
    # parity with single-device path
    single = m._fwd(m.params, pages[:2])
    np.testing.assert_allclose(out[:2], np.asarray(single), atol=1e-4)


def test_dp_parseq_tokens():
    m = _tiny_parseq()
    mesh = make_mesh(8, tp=1)
    run = DataParallel(mesh, m._tokens_fn, m.params)
    h, w = m.core.img_size
    crops = np.random.RandomState(1).rand(11, h, w, 3).astype(np.float32)
    ids, probs = run(crops, True, 1)
    assert ids.shape == (11, m.max_label_length + 1)
    assert probs.shape == ids.shape
    ref_ids, ref_probs = m._tokens_fn(m.params, crops, True, 1)
    np.testing.assert_array_equal(ids, np.asarray(ref_ids))
    np.testing.assert_allclose(probs, np.asarray(ref_probs), atol=1e-5)


def test_dp_tp_mesh_parseq():
    """2-D mesh: dp over crops, tp over the vocab head/embedding."""
    m = _tiny_parseq()
    mesh = make_mesh(8, tp=2)
    params = shard_params(m.params, parseq_param_shardings(m.params, mesh))
    h, w = m.core.img_size
    batch = np.random.RandomState(2).rand(8, h, w, 3).astype(np.float32)
    images, n = shard_batch(mesh, batch)
    with mesh:
        ids, probs = m._tokens_fn(params, images, True, 1)
    ref_ids, _ = m._tokens_fn(m.params, batch, True, 1)
    np.testing.assert_array_equal(np.asarray(ids)[:n], np.asarray(ref_ids))


def test_shard_batch_pads():
    mesh = make_mesh(8, tp=1)
    batch = np.ones((3, 4), np.float32)
    sharded, n = shard_batch(mesh, batch)
    assert n == 3 and sharded.shape[0] == 8
