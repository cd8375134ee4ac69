"""Measure the torch-CPU baseline for the PARSeq recognizer (reference
architecture mirror, random weights — pessimistic full-length AR decode,
same condition the JAX bench runs under). Records lines/sec."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import torch

from yomitoku_tpu.config import structured
from yomitoku_tpu.configs import TextRecognizerPARSeqSmallConfig
from tests.torch_ref.parseq_torch import PARSeqTorch

cfg = structured(TextRecognizerPARSeqSmallConfig)
print("cfg img", cfg.data.img_size, "max_label", cfg.max_label_length,
      "tokens", cfg.num_tokens, "enc", cfg.encoder.embed_dim, cfg.encoder.depth)
torch.manual_seed(0)
m = PARSeqTorch(cfg).eval()
batch = 32
h, w = cfg.data.img_size
x = torch.rand(batch, 3, h, w)
with torch.no_grad():
    m(x)  # warmup
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        m(x)
    dt = (time.perf_counter() - t0) / iters
print(f"torch CPU parseq-small: {batch/dt:.2f} lines/sec  ({dt:.2f}s / batch {batch})")
