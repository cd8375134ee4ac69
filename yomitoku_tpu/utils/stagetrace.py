"""Lightweight per-stage accounting for the page pipeline.

The pipeline stages (det / layout / tsr / rec / aggregate) wrap their
host work, device sync points, and host<->device transfers in
``segment(stage, kind, nbytes=...)`` blocks.  When no collector is
active (the default) a segment is a no-op guard; ``collect()`` installs
a process-wide collector — the pipeline runs pages from worker threads,
so events from concurrent pages interleave and are summed, which is the
quantity of interest (time attributed per stage per batch).

Used by bench.py to answer "where do the unhidden host+transfer
milliseconds go" with a stage table instead of one aggregate number.
"""

import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_active = None
_lock = threading.Lock()


class StageStats:
    """Accumulated per-(stage, kind) wall seconds / bytes / counts."""

    def __init__(self):
        self.seconds = defaultdict(float)
        self.bytes = defaultdict(int)
        self.counts = defaultdict(int)

    def add(self, stage, kind, dt, nbytes):
        key = (stage, kind)
        with _lock:
            self.seconds[key] += dt
            self.bytes[key] += nbytes
            self.counts[key] += 1

    def table(self, pages=1):
        """{stage: {kind: {ms, mb, n}}} averaged over ``pages``."""
        out = {}
        for (stage, kind), sec in sorted(self.seconds.items()):
            row = out.setdefault(stage, {})
            row[kind] = {
                "ms": round(sec * 1e3 / pages, 1),
                "n": round(self.counts[(stage, kind)] / pages, 1),
            }
            mb = self.bytes[(stage, kind)] / 1e6 / pages
            if mb:
                row[kind]["mb"] = round(mb, 3)
        return out


@contextmanager
def collect():
    """Install a fresh collector for the duration; yields the stats."""
    global _active
    stats = StageStats()
    prev, _active = _active, stats
    try:
        yield stats
    finally:
        _active = prev


@contextmanager
def segment(stage, kind, nbytes=0):
    """Attribute the enclosed wall time (and transferred bytes) to
    (stage, kind).  Free when no collector is active."""
    stats = _active
    if stats is None:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        stats.add(stage, kind, time.perf_counter() - t0, nbytes)


def note(stage, kind, seconds=0.0, nbytes=0):
    """Record an event measured externally."""
    stats = _active
    if stats is not None:
        stats.add(stage, kind, seconds, nbytes)
