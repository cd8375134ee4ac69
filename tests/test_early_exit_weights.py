"""bench.early_exit_params: crafted weights must make greedy decode emit
EOS at exactly step k (the production early-exit measurement relies on
this; verified here on the tiny config on CPU)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _tiny():
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextRecognizerPARSeqTinyConfig
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = structured(TextRecognizerPARSeqTinyConfig)
    cfg.encoder.depth = 1
    cfg.encoder.embed_dim = 32
    cfg.encoder.num_heads = 2
    cfg.decoder.embed_dim = 32
    cfg.decoder.num_heads = 2
    cfg.num_tokens = 16
    cfg.max_label_length = 8
    cfg.data.img_size = [16, 32]
    m = PARSeq(cfg)
    m.params = m.init_params(0)
    return m


def test_early_exit_ids():
    from bench import early_exit_params

    m = _tiny()
    k = 4
    m.params = early_exit_params(m, k, char_id=5)
    crops = np.random.RandomState(0).randint(
        0, 255, (3, *m.core.img_size, 3), np.uint8
    )
    ids, probs = m.forward_tokens(crops)
    assert (ids[:, : k - 1] == 5).all(), ids[:, : k - 1]
    assert (ids[:, k - 1] == 0).all(), ids[:, k - 1]  # EOS
    assert np.isfinite(probs).all()
