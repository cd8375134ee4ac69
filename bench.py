"""Benchmark harness: prints ONE JSON line.

Headline metric: DocumentAnalyzer device-time pages/sec on the default
model stack (dbnetv2_1 + rtdetrv2v2 layout + TSR + parseq-large-v4_1).
One "page" is the BASELINE.json config-5 workload:

    1 x DBNet detect (1280x960 bucket)
  + 1 x RT-DETR layout (640x640)
  + 2 x RT-DETR table-structure passes (640x640)
  + 1 x PARSeq-large recognizer batch of 128 line crops
        (batch buckets pad to 128; random weights => pessimistic
        full-101-step AR decode + cloze refinement)

``vs_baseline`` compares against the same composite measured on torch-CPU
mirrors of the reference architectures (single CPU core — all this
machine has; see BASELINE.md "Measured").

Timing uses utils.timing.device_time: block_until_ready does NOT
synchronize on this tunneled platform (it implies 32 PFLOP/s); enqueue N
programs and sync with one small readback instead — calibrated to within
a few % of matmul speed-of-light.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# torch-CPU mirror measurements (single core; BASELINE.md "Measured"):
#   DBNet 1280x960             7.07  s/page
#   RT-DETR 640                1.833 s/pass
#   PARSeq-large b4 AR+refine  (lines/sec below)
TORCH_CPU_DET_S = 7.07
TORCH_CPU_RTDETR_S = 1.833
TORCH_CPU_PARSEQ_LARGE_LPS = 0.313  # measured via tests/torch_ref mirror


def main():
    import jax.numpy as jnp
    import numpy as np

    from yomitoku_tpu.base import enable_compilation_cache
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import (
        LayoutParserRTDETRv2V2Config,
        TextDetectorDBNetV2_1Config,
        TextRecognizerPARSeqLargeV41Config,
    )
    from yomitoku_tpu.models.dbnet import DBNet
    from yomitoku_tpu.models.parseq import PARSeq
    from yomitoku_tpu.models.rtdetr import RTDETRv2
    from yomitoku_tpu.utils.timing import device_time

    enable_compilation_cache()
    rng = np.random.RandomState(0)

    det = DBNet(structured(TextDetectorDBNetV2_1Config))
    det.params = det.init_params(0)
    page = jnp.asarray(rng.randint(0, 255, (1, 1280, 960, 3), np.uint8))
    det_s = device_time(lambda: det._fwd_u8(det.dparams, page), iters=30)

    lay = RTDETRv2(structured(LayoutParserRTDETRv2V2Config))
    lay.params = lay.init_params(0)
    tile = jnp.asarray(rng.randint(0, 255, (1, 640, 640, 3), np.uint8))
    lay_s = device_time(lambda: lay._fwd(lay.dparams, tile), iters=30)

    rec = PARSeq(structured(TextRecognizerPARSeqLargeV41Config))
    rec.params = rec.init_params(0)
    h, w = rec.core.img_size
    crops = jnp.asarray(rng.randint(0, 255, (128, h, w, 3), np.uint8))
    rec_s = device_time(
        lambda: rec._tokens_fn(rec.dparams, crops, True, 1), iters=10
    )

    page_s = det_s + 3 * lay_s + rec_s  # layout + 2 TSR passes
    pages_per_sec = 1.0 / page_s

    cpu_page_s = (
        TORCH_CPU_DET_S
        + 3 * TORCH_CPU_RTDETR_S
        + 128 / TORCH_CPU_PARSEQ_LARGE_LPS
    )
    vs = pages_per_sec * cpu_page_s

    print(
        json.dumps(
            {
                "metric": "doc_analyzer_pages_per_sec_device",
                "value": round(pages_per_sec, 2),
                "unit": "pages/sec",
                "vs_baseline": round(vs, 1),
                "detail": {
                    "dbnet_1280x960_ms": round(det_s * 1e3, 2),
                    "rtdetr_640_ms": round(lay_s * 1e3, 2),
                    "parseq_large_b128_lines_per_sec": round(128 / rec_s, 1),
                    "torch_cpu_page_s": round(cpu_page_s, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
