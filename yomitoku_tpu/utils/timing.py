"""Device-time measurement that is robust to asynchronous dispatch.

Under some JAX platforms (notably tunneled devices), ``block_until_ready``
returns before the device actually finishes executing — timings based on
it can report physically impossible throughput (we measured an implied
32 PFLOP/s on a single v5e chip).  The only reliable synchronization is a
host readback of output data.  A single small readback costs a fixed
round-trip (~25 ms through a tunnel, ~10 us over PCIe), so we:

  1. measure the readback latency once,
  2. enqueue ``iters`` independent executions (the device runs programs
     FIFO on a core, so enqueue order == execution order),
  3. read back a tiny slice of the LAST output, which can only complete
     after every queued program has finished,
  4. subtract the readback latency and divide by ``iters``.

Calibrated against a 4096x4096 matmul: reports ~194 TFLOP/s on a v5e
(peak bf16 197; XLA runs f32 matmuls at bf16 MXU precision by default),
where block_until_ready-based timing reported 32,000 TFLOP/s.
"""

import time

import numpy as np

__all__ = ["readback_latency", "device_time"]


def _first_leaf(out):
    import jax

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "shape")]
    if not leaves:
        raise ValueError("timed function returned no array outputs")
    return leaves[0]


def _sync(out):
    """Force a minimal host readback of one output leaf."""
    leaf = _first_leaf(out)
    sl = leaf[tuple(slice(0, 1) for _ in leaf.shape)] if leaf.ndim else leaf
    np.asarray(sl)


def readback_latency(fn, samples: int = 3) -> float:
    """Round-trip latency of a tiny device->host readback, in seconds."""
    out = fn()
    _sync(out)
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def device_time(fn, iters: int = 50, warmup: int = 2) -> float:
    """Average device seconds per call of ``fn`` (a nullary closure over a
    jitted program and device-resident inputs)."""
    for _ in range(max(warmup, 1)):
        out = fn()
    _sync(out)
    rb = readback_latency(fn)
    # Size iters so the measured span dwarfs readback jitter.
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    span = time.perf_counter() - t0 - rb
    return max(span, 1e-9) / iters
