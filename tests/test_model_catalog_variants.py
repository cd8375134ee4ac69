"""Smoke tests: every catalog variant constructs, builds its parameter
pytree, and (for the cheap ones) runs a forward — catches config typos
and shape bugs across the whole model matrix without weights."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from yomitoku_tpu.config import structured


def _build(catalog, name):
    cfg_cls, model_cls = catalog.get(name)
    cfg = structured(cfg_cls)
    model = model_cls(cfg)
    model.params = model.init_params(0)
    return cfg, model


def _shapes(catalog, name, dummy_shape=None, method=None):
    """Trace param shapes without compute (fast config/shape check)."""
    import jax
    import jax.numpy as jnp

    cfg_cls, model_cls = catalog.get(name)
    cfg = structured(cfg_cls)
    model = model_cls(cfg)
    if dummy_shape is None:
        h, w = cfg.data.img_size
        dummy_shape = (1, h, w, 3)
    dummy = jnp.zeros(dummy_shape, jnp.float32)
    if method:
        variables = jax.eval_shape(
            lambda d: model.core.init(jax.random.PRNGKey(0), d, method=method),
            dummy,
        )
    else:
        variables = jax.eval_shape(
            lambda d: model.core.init(jax.random.PRNGKey(0), d), dummy
        )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    return cfg, variables, n


def test_text_detector_variants():
    from yomitoku_tpu.text_detector import TextDetectorModelCatalog

    cat = TextDetectorModelCatalog()
    for name in ("dbnet", "dbnetv2", "dbnetv2_1-lite"):
        cfg, variables, n = _shapes(cat, name, dummy_shape=(1, 64, 64, 3))
        assert n > 1e6
    # lite: same v2_1 weights repo, reduced page resolution
    lite_cfg_cls, _ = cat.get("dbnetv2_1-lite")
    full_cfg_cls, _ = cat.get("dbnetv2_1")
    lite, full = structured(lite_cfg_cls), structured(full_cfg_cls)
    assert lite.hf_hub_repo == full.hf_hub_repo
    assert lite.data.shortest_size < full.data.shortest_size
    assert lite.post_process == full.post_process
    cfg, m = _build(cat, "dbnetv2_1")  # default variant: full forward
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    out = m.forward_binary(x)
    assert out.shape == (1, 64, 64)
    assert np.isfinite(out).all()


def test_text_recognizer_variants():
    from yomitoku_tpu.text_recognizer import TextRecognizerModelCatalog

    cat = TextRecognizerModelCatalog()
    for name in (
        "parseq", "parseqv2", "parseq-small", "parseq-tiny",
        "parseq-large-v4_1",
    ):
        cfg, variables, n = _shapes(cat, name, method="encode")
        assert n > 1e6


def test_recognizer_tiny_forward():
    from yomitoku_tpu.text_recognizer import TextRecognizerModelCatalog

    cat = TextRecognizerModelCatalog()
    cfg, m = _build(cat, "parseq-tiny")
    h, w = cfg.data.img_size
    x = np.random.RandomState(0).rand(2, h, w, 3).astype(np.float32)
    ids, probs = m.forward_tokens(x)
    assert ids.shape == (2, cfg.max_label_length + 1)
    assert np.isfinite(probs).all()


def test_rtdetr_variants():
    from yomitoku_tpu.layout_parser import LayoutParserModelCatalog
    from yomitoku_tpu.table_cell_detector import TableParserModelCatalog
    from yomitoku_tpu.table_structure_recognizer import (
        TableStructureRecognizerModelCatalog,
    )

    for cat, names, n_classes, size in (
        (LayoutParserModelCatalog(), ("rtdetrv2", "rtdetrv2v2"), 6, 320),
        (TableStructureRecognizerModelCatalog(), ("rtdetrv2",), 3, 320),
        # 2500 queries need the full 640 pyramid (8400 tokens >= 2500)
        (TableParserModelCatalog(), ("rtdetrv2_beta",), 8, 640),
    ):
        for name in names:
            cfg, variables, n = _shapes(cat, name, dummy_shape=(1, size, size, 3))
            assert n > 1e6
            assert cfg.RTDETRTransformerv2.num_classes == n_classes


def test_rtdetr_small_forward():
    from yomitoku_tpu.table_structure_recognizer import (
        TableStructureRecognizerModelCatalog,
    )

    cfg, m = _build(TableStructureRecognizerModelCatalog(), "rtdetrv2")
    # anchors derive from actual feature shapes, so smaller inputs work
    x = np.random.RandomState(0).rand(1, 320, 320, 3).astype(np.float32)
    out = m.forward(x)
    q = cfg.RTDETRTransformerv2.num_queries
    assert out["pred_logits"].shape == (1, q, 3)
    assert out["pred_boxes"].shape == (1, q, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
