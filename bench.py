"""Benchmark harness: prints ONE JSON line.

Headline metric: **end-to-end wall-clock pages/sec of the real
DocumentAnalyzer pipeline** — image in, DocumentAnalyzerSchema out — on
the default model stack (dbnetv2_1 + rtdetrv2v2 layout + TSR +
parseq-large-v4_1).  Every stage of the production path runs and is
timed: host preprocessing, DBNet device forward + probability-map
readback, the full contour/minAreaRect/unclip postprocess, RT-DETR
layout + two table-structure passes, per-line perspective crops, the
PARSeq recognizer batch (128-bucket, full-length AR decode + cloze
refinement under random weights), tokenizer decode + NFKC, word->cell /
word->paragraph aggregation, ruby filtering, and reading order.

Deterministic workload: weights are random in this offline environment,
so the *content* of the detector/layout predictions is pinned to a
synthetic page layout (~96 text lines in two columns over six
paragraphs + 2 four-by-four tables + a figure; the recognizer pads to
its 128 bucket).  The pinning only swaps prediction contents after the
real device programs run — every compute and transfer cost stays.  With
converted checkpoints the same harness runs unpinned.

``vs_baseline`` compares against the torch-CPU composite of the
reference architectures measured on this machine's single core
(BASELINE.md "Measured"); that composite is device-forward-only, i.e. a
LOWER bound on the reference's true e2e page cost, so the reported
speedup is conservative.

Also reported in ``detail``: the round-1 device-time composite
(enqueue-N / readback-sync timing — block_until_ready does not
synchronize through the dev tunnel).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# torch-CPU mirror measurements (single core; BASELINE.md "Measured"):
TORCH_CPU_DET_S = 7.07
TORCH_CPU_RTDETR_S = 1.833
TORCH_CPU_PARSEQ_LARGE_LPS = 0.313

PAGE_H, PAGE_W = 1280, 960


def _build_workload():
    """Synthetic page: two text columns (3 paragraphs each), two 4x4
    tables, one figure.  Returns (page_image, line_quads, paragraphs,
    table_specs, figure_box)."""
    img = np.full((PAGE_H, PAGE_W, 3), 255, np.uint8)
    lines = []

    col_spans = [(40, 440), (520, 920)]
    para_rows = [(40, 295), (300, 555), (560, 810)]
    paragraphs = []
    for x0, x1 in col_spans:
        for y0, y1 in para_rows:
            paragraphs.append((x0 - 4, y0 - 4, x1 + 4, y1 + 4))
            y = y0
            while y + 20 <= y1:
                lines.append((x0, y, x1 - 20, y + 20))
                y += 24

    tables = []
    for x0, x1 in ((40, 460), (500, 920)):
        y0, y1 = 840, 1240
        cells = []
        cw, ch = (x1 - x0) // 4, (y1 - y0) // 4
        for r in range(4):
            for c in range(4):
                cx0, cy0 = x0 + c * cw, y0 + r * ch
                cells.append((cx0, cy0, cx0 + cw - 4, cy0 + ch - 4))
                lines.append((cx0 + 6, cy0 + 6, cx0 + cw - 14, cy0 + 24))
        tables.append({"box": (x0 - 4, y0 - 4, x1 + 4, y1 + 4), "cells": cells})

    for x0, y0, x1, y1 in lines:
        img[y0:y1, x0:x1] = (30, 30, 30)

    figure_box = (40, 5, 300, 35)
    quads = [
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1]] for x0, y0, x1, y1 in lines
    ]
    return img, quads, paragraphs, tables, figure_box


class _PinnedDetector:
    """Runs the real DBNet device path (preprocess, forward, readback)
    and the real contour/unclip postprocessor, on a probability map whose
    contents are painted with the known line layout."""

    def __init__(self, det, quads):
        self.det = det
        self.quads = quads
        self._painted = None

    def _paint(self, shape):
        if self._painted is not None and self._painted.shape == shape:
            return self._painted
        _, hm, wm = shape
        sy, sx = hm / PAGE_H, wm / PAGE_W
        prob = np.zeros(shape, np.float32)
        for quad in self.quads:
            x0, y0 = quad[0]
            x1, y1 = quad[2]
            prob[0, int(y0 * sy) + 2 : int(y1 * sy) - 2,
                 int(x0 * sx) + 2 : int(x1 * sx) - 2] = 0.9
        self._painted = prob
        return prob

    def __call__(self, img, page=None):
        from yomitoku_tpu.schemas import TextDetectorSchema

        if page is not None:
            from yomitoku_tpu.data.functions import shortest_edge_size

            out_hw = shortest_edge_size(
                *img.shape[:2],
                self.det._cfg.data.shortest_size,
                self.det._cfg.data.limit_size,
            )
            binary = self.det.model.forward_binary_from_page(
                page.dev, page.hw, out_hw
            )
        else:
            tensor = self.det.preprocess_u8(img)
            binary = self.det.model.forward_binary_u8(tensor)
        real = np.asarray(binary)  # device->host readback on the real map
        painted = self._paint(real.shape)
        quads, scores = self.det.postprocess(
            {"binary": painted}, img.shape[:2]
        )
        return TextDetectorSchema(points=quads, scores=scores), None


class _PinnedLayout:
    """Runs the real RT-DETR layout pass and real TSR passes on the
    pinned table boxes, then swaps in the synthetic layout contents."""

    def __init__(self, layout, paragraphs, tables, figure_box):
        self.layout = layout
        self.paragraphs = paragraphs
        self.tables = tables
        self.figure_box = figure_box

    def _synthetic_tables(self):
        from yomitoku_tpu.schemas import (
            TableCellSchema,
            TableLineSchema,
            TableStructureRecognizerSchema,
        )

        out = []
        for spec in self.tables:
            cells = [
                TableCellSchema(
                    row=i // 4 + 1, col=i % 4 + 1, row_span=1, col_span=1,
                    box=list(map(int, box)), contents=None,
                )
                for i, box in enumerate(spec["cells"])
            ]
            rows = [
                TableLineSchema(box=[spec["box"][0], c.box[1], spec["box"][2], c.box[3]], score=0.9)
                for c in cells[::4]
            ]
            cols = [
                TableLineSchema(box=[c.box[0], spec["box"][1], c.box[2], spec["box"][3]], score=0.9)
                for c in cells[:4]
            ]
            out.append(
                TableStructureRecognizerSchema(
                    box=list(map(int, spec["box"])), n_row=4, n_col=4,
                    rows=rows, cols=cols, spans=[], cells=cells, order=0,
                )
            )
        return out

    def __call__(self, img, page=None):
        from yomitoku_tpu.schemas import Element, LayoutAnalyzerSchema

        # real device + postprocess cost of the layout parser
        self.layout.layout_parser(img, page=page)
        # real TSR passes on the two pinned table crops
        self.layout.table_structure_recognizer(
            img, [spec["box"] for spec in self.tables], page=page
        )
        return (
            LayoutAnalyzerSchema(
                paragraphs=[
                    Element(id=None, box=list(map(int, b)), score=0.95,
                            role=None, contents=None)
                    for b in self.paragraphs
                ],
                tables=self._synthetic_tables(),
                figures=[
                    Element(
                        id=None, box=list(map(int, self.figure_box)),
                        score=0.9, role=None, contents=None,
                    )
                ],
            ),
            None,
        )


def run_e2e(device="tpu", warmup=2, iters=8):
    """Returns (pipelined_page_s, latency_page_s, workload): throughput is
    measured over analyzer.batch() (pages overlap, as the CLI runs
    multi-page documents); latency is the single-page sequential path."""
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer

    img, quads, paragraphs, tables, figure_box = _build_workload()
    analyzer = DocumentAnalyzer(visualize=False, device=device)
    analyzer.text_detector = _PinnedDetector(analyzer.text_detector, quads)
    analyzer.layout = _PinnedLayout(analyzer.layout, paragraphs, tables, figure_box)

    for _ in range(warmup):
        result, _, _ = analyzer(img)
    n_words = len(result.words)
    n_paragraphs = len(result.paragraphs)

    t0 = time.perf_counter()
    for _ in range(iters):
        analyzer(img)
    latency_s = (time.perf_counter() - t0) / iters

    analyzer.batch([img] * 2)  # warm the pipelined path
    # median of three batches: the dev tunnel's bandwidth swings
    # minute-to-minute by 2-4x, and a single batch run inherits whatever
    # window it lands in
    rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        analyzer.batch([img] * iters)
        rounds.append((time.perf_counter() - t0) / iters)
    pipelined_s = sorted(rounds)[1]

    return pipelined_s, latency_s, {
        "lines": len(quads), "words": n_words,
        "paragraphs": n_paragraphs, "tables": len(tables),
    }


def run_device_composite():
    """Round-1 device-time composite (isolated forwards, FIFO-sync
    timing) — kept for continuity with BENCH_r01."""
    import jax.numpy as jnp

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
    return det_s, lay_s, rec_s


def measure_link():
    """Host<->device link characteristics.  On this dev platform the TPU
    sits behind a tunnel with ~50-100 ms round-trip latency and
    ~10-40 MB/s bandwidth that fluctuates minute-to-minute; e2e wall
    numbers are transfer-floor-bound and must be read against these.  (A
    production host's PCIe link is ~3 orders of magnitude faster.)"""
    import jax

    dev = jax.devices()[0]
    tiny = np.zeros((8,), np.float32)
    big = np.random.RandomState(0).rand(1024, 1024).astype(np.float32)
    lat, bw = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jax.device_put(tiny, dev))
        lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jax.device_put(big, dev))
        bw.append(time.perf_counter() - t0)
    lat_ms = min(lat) * 1e3
    bw_mbs = 2 * big.nbytes / 1e6 / max(min(bw) - min(lat), 1e-6)
    return round(lat_ms, 1), round(bw_mbs, 1)


def main():
    from yomitoku_tpu.base import enable_compilation_cache

    enable_compilation_cache()

    link_lat_ms, link_bw_mbs = measure_link()
    page_s, latency_s, workload = run_e2e()
    pages_per_sec = 1.0 / page_s

    det_s, lay_s, rec_s = run_device_composite()
    device_page_s = det_s + 3 * lay_s + rec_s

    cpu_page_s = (
        TORCH_CPU_DET_S
        + 3 * TORCH_CPU_RTDETR_S
        + 128 / TORCH_CPU_PARSEQ_LARGE_LPS
    )

    print(
        json.dumps(
            {
                "metric": "doc_analyzer_e2e_pages_per_sec",
                "value": round(pages_per_sec, 2),
                "unit": "pages/sec",
                "vs_baseline": round(pages_per_sec * cpu_page_s, 1),
                "detail": {
                    "e2e_pipelined_page_ms": round(page_s * 1e3, 1),
                    "e2e_single_page_latency_ms": round(latency_s * 1e3, 1),
                    "link_roundtrip_ms": link_lat_ms,
                    "link_bandwidth_mb_s": link_bw_mbs,
                    "workload": workload,
                    "device_composite_pages_per_sec": round(
                        1.0 / device_page_s, 2
                    ),
                    "dbnet_1280x960_ms": round(det_s * 1e3, 2),
                    "rtdetr_640_ms": round(lay_s * 1e3, 2),
                    "parseq_large_b128_lines_per_sec": round(128 / rec_s, 1),
                    "torch_cpu_page_s_lower_bound": round(cpu_page_s, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
