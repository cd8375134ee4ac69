"""DBNet conversion parity: random-init torch mirror -> convert_dbnet ->
jitted JAX program must reproduce the binary probability map."""

import numpy as np
import torch

from yomitoku_tpu.config import structured
from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config


def _randomize_bn_stats(model):
    """Random running stats so FrozenBN conversion is actually exercised
    (fresh BN has mean=0/var=1 which would hide mean/var mix-ups)."""
    g = torch.Generator().manual_seed(7)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


def test_dbnet_conversion_parity():
    from tests.torch_ref.dbnet_torch import DBNetTorch
    from yomitoku_tpu.models.dbnet import DBNet

    torch.manual_seed(0)
    tmodel = DBNetTorch().eval()
    _randomize_bn_stats(tmodel)

    cfg = structured(TextDetectorDBNetV2_1Config)
    jmodel = DBNet(cfg)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    jmodel.params = jmodel.convert_torch_state_dict(sd)

    x = np.random.RandomState(0).rand(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()[:, 0]
    jy = jmodel.forward_binary(x)

    assert jy.shape == ty.shape == (1, 64, 96)
    np.testing.assert_allclose(jy, ty, atol=2e-4)
