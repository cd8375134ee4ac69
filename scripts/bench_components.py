"""Benchmark each model component on the default platform (TPU under the
driver) — device-time via utils.timing.device_time (readback-synced;
block_until_ready does not synchronize on tunneled platforms).  Prints a
JSON dict.

Usage: python scripts/bench_components.py [det|rec|layout|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yomitoku_tpu.base import enable_compilation_cache
from yomitoku_tpu.config import structured
from yomitoku_tpu.utils.timing import device_time

enable_compilation_cache()

RESULTS = {}


def _time(fn, iters=50):
    return device_time(fn, iters=iters)


def bench_det():
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.models.dbnet import DBNet

    cfg = structured(TextDetectorDBNetV2_1Config)
    m = DBNet(cfg)
    m.params = m.init_params(0)
    # representative page bucket: 1280 x 960 (A4 at shortest 1280 snaps
    # near 1280x960..1792; use one bucket)
    x = jnp.asarray(np.random.rand(1, 1280, 960, 3).astype(np.float32))
    dt = _time(lambda: m._fwd(m.dparams, x))
    RESULTS["dbnet_1280x960_ms"] = round(dt * 1e3, 2)
    RESULTS["dbnet_pages_per_sec"] = round(1 / dt, 2)


def bench_rec():
    from yomitoku_tpu.configs import TextRecognizerPARSeqLargeV41Config
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = structured(TextRecognizerPARSeqLargeV41Config)
    m = PARSeq(cfg)
    m.params = m.init_params(0)
    for batch in (128, 256):
        h, w = m.core.img_size
        x = jnp.asarray(np.random.rand(batch, h, w, 3).astype(np.float32))
        dt = _time(lambda: m._tokens_fn(m.dparams, x, True, 1), iters=20)
        RESULTS[f"parseq_large_b{batch}_lines_per_sec"] = round(batch / dt, 1)


def bench_layout():
    from yomitoku_tpu.configs import LayoutParserRTDETRv2V2Config
    from yomitoku_tpu.models.rtdetr import RTDETRv2

    cfg = structured(LayoutParserRTDETRv2V2Config)
    m = RTDETRv2(cfg)
    m.params = m.init_params(0)
    x = jnp.asarray(np.random.rand(1, 640, 640, 3).astype(np.float32))
    dt = _time(lambda: m._fwd(m.dparams, x))
    RESULTS["rtdetr_640_ms"] = round(dt * 1e3, 2)
    x4 = jnp.asarray(np.random.rand(4, 640, 640, 3).astype(np.float32))
    dt4 = _time(lambda: m._fwd(m.dparams, x4))
    RESULTS["rtdetr_640_b4_ms"] = round(dt4 * 1e3, 2)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("det", "all"):
        bench_det()
    if which in ("rec", "all"):
        bench_rec()
    if which in ("layout", "all"):
        bench_layout()
    print(json.dumps(RESULTS))
