"""Benchmark harness: prints ONE JSON line.

Current headline metric: text-recognition throughput (lines/sec) of the
jitted PARSeq program on the default platform (real TPU chip under the
driver).  ``vs_baseline`` compares against the reference's PyTorch CPU
path measured via a torch mirror of the same architecture (see
BASELINE.md; the reference publishes no numbers of its own).

Will grow to DocumentAnalyzer pages/sec once the detector + layout models
land (BASELINE.json config 5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Measured torch-CPU lines/sec for the mirrored parseq-small AR decode
# (batch 32, 32x800 input, max_label 100, random weights => pessimistic
# full-length decode, same condition as the JAX bench below) — see
# BASELINE.md "measured" and scripts/measure_baseline_parseq.py.
TORCH_CPU_BASELINE_LINES_PER_SEC = 5.96


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextRecognizerPARSeqSmallConfig
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = structured(TextRecognizerPARSeqSmallConfig)
    m = PARSeq(cfg)
    m.params = m.init_params(0)  # host-CPU init

    batch = 128
    h, w = m.core.img_size
    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, h, w, 3).astype(np.float32)
    )

    # Device-time throughput.  NOTE: block_until_ready does NOT actually
    # synchronize under the tunneled device — it reports impossible
    # numbers (32 PFLOP/s implied).  utils.timing.device_time enqueues N
    # executions and syncs with a single small host readback of the last
    # output (device programs run FIFO), which is calibrated to within a
    # few % of matmul speed-of-light.
    from yomitoku_tpu.utils.timing import device_time

    dt = device_time(lambda: m._tokens_fn(m.dparams, x, True, 1), iters=20)
    lines_per_sec = batch / dt

    vs = (
        lines_per_sec / TORCH_CPU_BASELINE_LINES_PER_SEC
        if TORCH_CPU_BASELINE_LINES_PER_SEC
        else None
    )
    print(
        json.dumps(
            {
                "metric": "parseq_small_lines_per_sec",
                "value": round(lines_per_sec, 2),
                "unit": "lines/sec",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
