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
