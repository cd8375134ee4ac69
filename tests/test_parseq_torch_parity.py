"""End-to-end conversion parity: random-init the torch mirror of the
reference PARSeq, convert its state_dict through ``convert_parseq``, and
require the jitted JAX program to reproduce its output distributions.

This validates the whole chain — weight layout transposes, packed-MHA
split, module tree mapping, AR while_loop semantics, cloze refine mask
aliasing — without needing the real checkpoints (no network here)."""

import numpy as np
import pytest
import torch

from yomitoku_tpu.config import structured
from yomitoku_tpu.configs import TextRecognizerPARSeqTinyConfig


def small_cfg(depth=2, dec_depth=1):
    cfg = structured(TextRecognizerPARSeqTinyConfig)
    cfg.encoder.depth = depth
    cfg.encoder.embed_dim = 48
    cfg.encoder.num_heads = 4
    cfg.encoder.patch_size = [8, 8]
    cfg.decoder.embed_dim = 48
    cfg.decoder.num_heads = 4
    cfg.decoder.depth = dec_depth
    cfg.num_tokens = 24
    cfg.max_label_length = 6
    cfg.data.img_size = [32, 48]
    return cfg


@pytest.mark.parametrize("refine_iters", [0, 1])
def test_parseq_conversion_parity(refine_iters):
    from tests.torch_ref.parseq_torch import PARSeqTorch
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = small_cfg()
    cfg.refine_iters = refine_iters
    torch.manual_seed(0)
    tmodel = PARSeqTorch(cfg).eval()

    jmodel = PARSeq(cfg)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    jmodel.params = jmodel.convert_torch_state_dict(sd)

    rng = np.random.RandomState(0)
    x = rng.rand(3, 32, 48, 3).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    t_probs = torch.softmax(torch.from_numpy(t_logits), dim=-1).numpy()

    j_probs = jmodel.forward_probs(x)

    # The torch mirror truncates at the early-exit step when refine is off;
    # compare the overlapping steps.
    L = t_probs.shape[1]
    np.testing.assert_allclose(j_probs[:, :L], t_probs, atol=2e-4)


def test_parseq_conversion_parity_nar():
    """decode_ar=False path (single full-width decode)."""
    from tests.torch_ref.parseq_torch import PARSeqTorch
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = small_cfg()
    cfg.decode_ar = False
    cfg.refine_iters = 1
    torch.manual_seed(1)
    tmodel = PARSeqTorch(cfg).eval()
    jmodel = PARSeq(cfg)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    jmodel.params = jmodel.convert_torch_state_dict(sd)

    x = np.random.RandomState(1).rand(2, 32, 48, 3).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    t_probs = torch.softmax(torch.from_numpy(t_logits), dim=-1).numpy()
    j_probs = jmodel.forward_probs(x)
    np.testing.assert_allclose(j_probs, t_probs, atol=2e-4)
