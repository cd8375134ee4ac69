"""utils.stagetrace: no-op when inactive, thread-safe accumulation."""

import threading
import time

from yomitoku_tpu.utils.stagetrace import collect, note, segment


def test_segment_noop_without_collector():
    with segment("det", "sync", nbytes=100):
        pass  # must not raise or record anywhere


def test_collect_accumulates_and_tables():
    with collect() as stats:
        with segment("det", "sync", nbytes=1_000_000):
            time.sleep(0.01)
        with segment("det", "sync", nbytes=1_000_000):
            pass
        with segment("rec", "tokenize"):
            pass
        note("page", "upload", seconds=0.5, nbytes=2_000_000)
    table = stats.table(pages=2)
    assert table["det"]["sync"]["n"] == 1.0  # 2 events / 2 pages
    assert table["det"]["sync"]["mb"] == 1.0
    assert table["det"]["sync"]["ms"] >= 5
    assert table["page"]["upload"]["ms"] == 250.0
    assert "mb" not in table["rec"]["tokenize"]
    # collector deactivated outside the context
    with segment("det", "sync", nbytes=5):
        pass
    assert stats.counts[("det", "sync")] == 2


def test_collect_threads():
    def work():
        for _ in range(50):
            with segment("rec", "host"):
                pass

    with collect() as stats:
        threads = [threading.Thread(target=work) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert stats.counts[("rec", "host")] == 200
