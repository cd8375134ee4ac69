"""RT-DETRv2 conversion parity against the REAL reference implementation
(loaded from /root/reference, see torch_ref/load_reference.py): random-init
the reference model, convert its state_dict, and require our jitted NHWC
program to reproduce pred_logits / pred_boxes."""

import numpy as np
import pytest
import torch

from yomitoku_tpu.config import structured
from yomitoku_tpu.configs import LayoutParserRTDETRv2V2Config


def small_cfg(img=128, num_queries=20):
    """Full architecture at reduced spatial size / query count so the CPU
    parity run stays fast (all code paths identical)."""
    cfg = structured(LayoutParserRTDETRv2V2Config)
    cfg.data.img_size = [img, img]
    cfg.RTDETRTransformerv2.eval_spatial_size = [img, img]
    cfg.RTDETRTransformerv2.num_queries = num_queries
    return cfg


def test_rtdetr_conversion_parity():
    from tests.torch_ref.load_reference import build_reference_rtdetr
    from yomitoku_tpu.models.rtdetr import RTDETRv2

    cfg = small_cfg()
    torch.manual_seed(0)
    tmodel = build_reference_rtdetr(cfg).eval()
    # randomize BN running stats so conversion mix-ups can't hide
    g = torch.Generator().manual_seed(7)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)

    jmodel = RTDETRv2(cfg)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    jmodel.params = jmodel.convert_torch_state_dict(sd)

    x = np.random.RandomState(0).rand(2, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    j_out = jmodel.forward(x)

    t_logits = t_out["pred_logits"].numpy()
    t_boxes = t_out["pred_boxes"].numpy()
    j_logits = np.asarray(j_out["pred_logits"])
    j_boxes = np.asarray(j_out["pred_boxes"])

    assert j_logits.shape == t_logits.shape
    assert j_boxes.shape == t_boxes.shape

    # Top-k selection order can differ on near-ties; compare as sets by
    # matching each torch query to the nearest jax query.
    np.testing.assert_allclose(
        np.sort(j_logits.ravel()), np.sort(t_logits.ravel()), atol=5e-3
    )
    np.testing.assert_allclose(j_logits, t_logits, atol=5e-3)
    np.testing.assert_allclose(j_boxes, t_boxes, atol=5e-3)


def test_layernorm_eps_matches_torch_at_collapsed_variance():
    """Deep random-init features collapse per-token variance to ~1e-6,
    where flax's default LayerNorm eps (1e-6) vs torch's 1e-5 becomes an
    O(1) output error (measured max|delta|=1.14 on the AIFI norm at
    640x640, scrambling top-k query selection).  Pin our RT-DETR norms
    to torch semantics in exactly that regime: with attention and FFN
    zeroed, norm1(x + 0) must match eps-1e-5 LayerNorm and must NOT
    match eps-1e-6."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yomitoku_tpu.models.layers.rtdetr_encoder import AIFILayer

    d = 32
    rng = np.random.RandomState(0)
    base = rng.rand(1, 8, d).astype(np.float32)
    # tokens whose across-channel variance is ~1e-6
    x = base.mean(-1, keepdims=True) + 1e-3 * (
        base - base.mean(-1, keepdims=True)
    )

    import flax.linen as nn

    def flax_ln(v, eps):
        # flax's fast-variance formula — at var ~1e-6 the two-pass numpy
        # formula differs measurably, and the pin is about EPS, not the
        # variance estimator
        mod = nn.LayerNorm(epsilon=eps)
        p = {"params": {"scale": np.ones(d, np.float32),
                        "bias": np.zeros(d, np.float32)}}
        return np.asarray(mod.apply(p, jnp.asarray(v)))

    want5 = flax_ln(x, 1e-5)
    want6 = flax_ln(x, 1e-6)
    # the collapsed-variance input separates the two eps choices by O(1)
    assert np.abs(want5 - want6).max() > 0.3

    layer = AIFILayer(d_model=d, nhead=4, dim_feedforward=64)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.zeros((1, 8, d))
    )
    zp = jax.tree_util.tree_map(jnp.zeros_like, params)["params"]
    for name in ("norm1", "norm2"):
        zp[name]["scale"] = jnp.ones_like(zp[name]["scale"])
    _, inter = layer.apply(
        {"params": zp}, jnp.asarray(x), jnp.zeros((1, 8, d)),
        capture_intermediates=lambda mdl, _: mdl.name == "norm1",
    )
    got = np.asarray(
        list(inter["intermediates"]["norm1"].values())[0][0], np.float32
    )
    np.testing.assert_allclose(got, want5, atol=2e-5)
    assert np.abs(got - want6).max() > 0.3
