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
converted checkpoints the same harness runs unpinned.  Caveat: the
painted probability map is 96 clean rectangles; real DBNet maps have
ragged blobs with more contours and unclip work, so the host
postprocess share reported here is a LOWER bound on production pages.

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


def _pin_detector(det, quads, paint_shape=None):
    """Swap the detector map CONTENTS for the painted line layout after
    the real forward + readback, before the real contour/unclip pass."""
    painted_cache = {}

    def _paint(shape):
        """Painted map with realistic texture, not clean rectangles: each
        line blob has per-pixel prob in [0.55, 0.95] and ragged 0-2 px
        row indents (scores stay well above box_thresh=0.4), and ~150
        speckle blobs in the column gutter sit at ~0.35 — above
        thresh=0.3, so the contour pass labels, hulls, and scores them
        before dropping every one below box_thresh, the way real DBNet
        maps make the postprocessor work for its keep set."""
        if shape not in painted_cache:
            rng = np.random.RandomState(7)
            _, hm, wm = shape
            sy, sx = hm / PAGE_H, wm / PAGE_W
            prob = np.zeros(shape, np.float32)
            for quad in quads:
                x0, y0 = quad[0]
                x1, y1 = quad[2]
                ya, yb = int(y0 * sy) + 2, int(y1 * sy) - 2
                xa, xb = int(x0 * sx) + 2, int(x1 * sx) - 2
                blob = rng.uniform(0.55, 0.95, (yb - ya, xb - xa)).astype(
                    np.float32
                )
                indent = rng.randint(0, 3, (yb - ya, 2))
                for r in range(yb - ya):
                    blob[r, : indent[r, 0]] = 0.0
                    blob[r, blob.shape[1] - indent[r, 1] :] = 0.0
                prob[0, ya:yb, xa:xb] = blob
            # gutter speckles (x in [452, 508) between the text columns)
            gx0, gx1 = int(452 * sx), int(508 * sx)
            for _ in range(150):
                py = rng.randint(0, hm - 4)
                px = rng.randint(gx0, max(gx1 - 4, gx0 + 1))
                s = rng.randint(2, 5)
                prob[0, py : py + s, px : px + s] = rng.uniform(
                    0.32, 0.38, (s, s)
                ).astype(np.float32)
            painted_cache[shape] = prob
        return painted_cache[shape]

    real_det_post = det.postprocess

    def det_postprocess(preds, image_size):
        real = np.asarray(preds["binary"])  # the fetched real map
        # paint_shape: small-model tests paint on a fixed canvas (their
        # tiny real maps would swallow the 20 px lines)
        shape = paint_shape or real.shape
        return real_det_post({"binary": _paint(shape)}, image_size)

    det.postprocess = det_postprocess


def _pin_layout(lp, img, paragraphs, tables, figure_box):
    """Swap the filtered layout elements for the synthetic page layout
    after the real forward + top-k + readback; kept tables stay the REAL
    top-score detections so they match the fused program's device
    slots."""
    table_label = next(
        i for i, c in lp.label_mapper.items() if c == "tables"
    )
    # Random weights leave whole classes (tables included) under the
    # detection threshold, so the fused program's device-selected TSR
    # slots would never fire and every page would pay the fallback
    # dispatch — unlike production.  Spread + rebalance the layout
    # score heads so every class yields saturated, stable detections
    # (yomitoku_tpu/utils/synthetic_heads.py; same trick as the
    # multichip dryrun).
    from yomitoku_tpu.utils.synthetic_heads import (
        balance_final_score_head,
        spread_score_heads,
    )

    lp.model.params = spread_score_heads(lp.model.params)
    balance_final_score_head(lp.model, lp.preprocess(img))

    def filtering_elements(preds):
        # keep the top-score REAL table detections (the same
        # score-descending selection the fused program's device TSR
        # slots use, so slots and kept tables match exactly — as they do
        # with real weights); pad from the synthetic spec if the random
        # weights found fewer.  The synthetic paragraph/figure boxes
        # never touch the device.
        real_tables = preds["boxes"][preds["labels"] == table_label]
        table_boxes = [
            b.astype(int).tolist() for b in real_tables[: len(tables)]
        ]
        table_boxes += [
            list(map(int, spec["box"]))
            for spec in tables[len(table_boxes):]
        ]
        el = lambda box, score, role: {
            "id": None, "box": list(map(int, box)), "score": score,
            "role": role, "contents": None,
        }
        return {
            "paragraphs": [el(b, 0.95, None) for b in paragraphs],
            "tables": [el(b, 0.95, None) for b in table_boxes],
            "figures": [el(figure_box, 0.9, None)],
        }

    lp.filtering_elements = filtering_elements


def _pin_analyzer(analyzer, img, quads, paragraphs, tables, figure_box,
                  paint_shape=None):
    """Pin prediction CONTENTS at the postprocess seams, leaving every
    device program, transfer, and host pass of the REAL pipeline
    (threaded or fused) in place:

      * detector: the real probability map is computed and fetched, then
        its contents are swapped for the painted line layout before the
        real contour/unclip pass runs;
      * layout: the real forward + top-k + readback run, then the
        filtered elements are swapped for the synthetic page layout;
      * TSR: the real per-table crop forwards + readbacks run on the
        pinned table boxes, then the synthetic 4x4 tables are returned.
    """
    _pin_detector(analyzer.text_detector, quads, paint_shape)
    _pin_layout(
        analyzer.layout.layout_parser, img, paragraphs, tables, figure_box
    )

    def synthetic_tables():
        """The pinned 4x4 grids (aligned to the painted line layout, so
        the aggregation workload stays constant); the TSR crops above
        ran at the REAL detected boxes."""
        from yomitoku_tpu.schemas import (
            TableCellSchema,
            TableLineSchema,
            TableStructureRecognizerSchema,
        )

        out = []
        for spec in tables:
            cells = [
                TableCellSchema(
                    row=i // 4 + 1, col=i % 4 + 1, row_span=1, col_span=1,
                    box=list(map(int, box)), contents=None,
                )
                for i, box in enumerate(spec["cells"])
            ]
            rows = [
                TableLineSchema(
                    box=[spec["box"][0], c.box[1], spec["box"][2], c.box[3]],
                    score=0.9,
                )
                for c in cells[::4]
            ]
            cols = [
                TableLineSchema(
                    box=[c.box[0], spec["box"][1], c.box[2], spec["box"][3]],
                    score=0.9,
                )
                for c in cells[:4]
            ]
            out.append(
                TableStructureRecognizerSchema(
                    box=list(map(int, spec["box"])), n_row=4, n_col=4,
                    rows=rows, cols=cols, spans=[], cells=cells, order=0,
                )
            )
        return out

    tsr = analyzer.layout.table_structure_recognizer
    # both the threaded and fused paths funnel through
    # tables_from_filtered, AFTER the real forwards + readbacks
    tsr.tables_from_filtered = lambda data, filtered: synthetic_tables()


def _median(xs):
    """Lower median (len//2 of the sorted list) — one ACTUAL window, so
    the matching stage table exists."""
    return sorted(xs)[(len(xs) - 1) // 2]


def run_e2e(device="tpu", warmup=2, iters=8, pairs=4):
    """Returns (pipelined_page_s, latency_page_s, workload, stage table,
    early_exit_page_s, dp_page_s, dp stage table): throughput is measured
    over analyzer.batch() (pages overlap, as the CLI runs multi-page
    documents); latency is the single-page sequential path.

    Statistics (ADVICE r4): every compared path reports the MEDIAN of its
    windows; all windows are disclosed in the workload detail.  The
    batch-vs-DP comparison is a PAIRED A/B: the two paths alternate
    window-by-window inside the same minute, so both ride the same
    tunnel-bandwidth weather, and the headline dp ratio is the median of
    the per-pair ratios (VERDICT r4 #1)."""
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer

    img, quads, paragraphs, tables, figure_box = _build_workload()
    analyzer = DocumentAnalyzer(visualize=False, device=device)
    _pin_analyzer(analyzer, img, quads, paragraphs, tables, figure_box)

    for _ in range(warmup):
        result, _, _ = analyzer(img)
    n_words = len(result.words)
    n_paragraphs = len(result.paragraphs)

    t0 = time.perf_counter()
    for _ in range(iters):
        analyzer(img)
    latency_s = (time.perf_counter() - t0) / iters

    from yomitoku_tpu.ops.device_crop import device_crops_enabled
    from yomitoku_tpu.utils.stagetrace import collect

    analyzer.batch([img] * 2)  # warm the pipelined path
    dp_enabled = device_crops_enabled()
    dp_iters = max(4, (iters // 4) * 4)
    if dp_enabled:
        # warm (compiles the page-batched fused program)
        analyzer._batch_dp_fused([img] * 4)

    # Interleaved paired windows: batch() and the page-DP path
    # back-to-back, `pairs` times, ALTERNATING which runs first so a
    # within-pair bandwidth trend can't systematically tax one path.
    # The dev tunnel's bandwidth swings minute-to-minute by 2-4x;
    # adjacent windows share the same weather.
    rounds, stage_tables = [], []
    dp_rounds, dp_stage_tables = [], []

    def _run_batch():
        with collect() as stats:
            t0 = time.perf_counter()
            analyzer.batch([img] * iters)
            rounds.append((time.perf_counter() - t0) / iters)
        stage_tables.append(stats.table(pages=iters))

    def _run_dp():
        with collect() as stats:
            t0 = time.perf_counter()
            analyzer._batch_dp_fused([img] * dp_iters)
            dp_rounds.append((time.perf_counter() - t0) / dp_iters)
        dp_stage_tables.append(stats.table(pages=dp_iters))

    for p in range(pairs):
        if not dp_enabled:
            _run_batch()
        elif p % 2 == 0:
            _run_batch()
            _run_dp()
        else:
            _run_dp()
            _run_batch()

    # production-realistic recognizer: early-exit weights (EOS at step
    # 25, a typical Japanese line length) through the SAME pipeline
    rec_model = analyzer.text_recognizer.model
    base_params = rec_model.params
    rec_model.params = early_exit_params(rec_model, 25)
    analyzer.batch([img] * 2)  # warm the param swap
    early_rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        analyzer.batch([img] * iters)
        early_rounds.append((time.perf_counter() - t0) / iters)
    early_pipelined_s = _median(early_rounds)

    # One extra time-spaced base window (minutes after the first pairs)
    # for window diversity; it joins the median like any other window.
    rec_model.params = base_params
    analyzer.batch([img] * 2)  # rewarm original params
    with collect() as stats:
        t0 = time.perf_counter()
        analyzer.batch([img] * iters)
        late_s = (time.perf_counter() - t0) / iters
    rounds.append(late_s)
    stage_tables.append(stats.table(pages=iters))

    pipelined_s = _median(rounds)
    median_idx = rounds.index(pipelined_s)
    dp_s = _median(dp_rounds) if dp_rounds else None
    dp_stages = (
        dp_stage_tables[dp_rounds.index(dp_s)] if dp_rounds else None
    )
    paired = [
        round(d / b, 3) for b, d in zip(rounds, dp_rounds)
    ]

    return pipelined_s, latency_s, {
        "lines": len(quads), "words": n_words,
        "paragraphs": n_paragraphs, "tables": len(tables),
        "e2e_windows_ms": [round(r * 1e3, 1) for r in rounds],
        "dp_windows_ms": [round(r * 1e3, 1) for r in dp_rounds],
        "dp_over_batch_paired_ratios": paired,
        "dp_over_batch_paired_median": (
            _median(paired) if paired else None
        ),
        "e2e_earlyexit_windows_ms": [
            round(r * 1e3, 1) for r in early_rounds
        ],
    }, stage_tables[median_idx], early_pipelined_s, dp_s, dp_stages


def _pin_semantic_parser(parser, img, quads, paragraphs, tables, figure_box,
                         paint_shape=None):
    """Pin the TableSemanticParser pipeline the same way _pin_analyzer
    pins DocumentAnalyzer: painted detector map, synthetic layout with
    REAL top-score table boxes (so the fused program's device cell-crop
    slots match), and deterministic cell detections swapped in AFTER the
    real 2500-query forward + readback + top-k filter.  Every device
    program, transfer, and host pass (contours, containment filters,
    hole mining, clustering, grid/kv parsing) still runs."""
    _pin_detector(parser.text_detector, quads, paint_shape)
    _pin_layout(parser.layout_parser, img, paragraphs, tables, figure_box)

    cell = parser.cell_detector
    cat = {c: i for i, c in cell.label_mapper.items()}
    real_fp = cell.postprocessor.filter_packed

    calls = [0]

    def filter_packed(packed, orig_sizes, threshold):
        # the real host filter runs first (its cost stays measured), then
        # the detections are swapped for deterministic layouts — with
        # random weights the raw keep-set is an arbitrary pile of
        # hundreds of boxes whose O(n^2) host filters measure a workload
        # no real checkpoint produces.  Alternating per crop: a 4x4 grid
        # (row 0 headers, rows 1-3 cells -> grid_parser) and a 4-row
        # key-value table (header column | value column, no >=2-line hard
        # row/col structure -> kv_parser), so BOTH semantic branches sit
        # inside the timed path (VERDICT r4 #2: kv_items was 0).
        real_fp(packed, orig_sizes, threshold)
        outs = []
        for w, h in np.asarray(orig_sizes, np.float32).reshape(-1, 2):
            boxes, labels = [], []
            if calls[0] % 2 == 0:
                cw, ch = w / 4.0, h / 4.0
                for r in range(4):
                    for c in range(4):
                        x0, y0 = c * cw + 2.0, r * ch + 2.0
                        boxes.append(
                            [x0, y0, x0 + cw - 4.0, y0 + ch - 4.0]
                        )
                        labels.append(
                            cat["header"] if r == 0 else cat["cell"]
                        )
            else:
                # 4 stacked (header | value) pairs with clear vertical
                # gaps: one hard-adjacency column per role -> not a grid.
                # Margins scale with the crop (real random-weight table
                # detections can be <100 px tall; fixed 8 px margins left
                # ~5 px rows that postprocess collapsed to <2 cells,
                # silently dropping the table and the kv branch with it)
                cw, ch = w / 2.0, h / 4.0
                gap = max(2.0, 0.15 * ch)
                for r in range(4):
                    y0 = r * ch + gap
                    y1 = (r + 1) * ch - gap
                    boxes.append([2.0, y0, cw - 4.0, y1])
                    labels.append(cat["header"])
                    boxes.append([cw + 2.0, y0, w - 4.0, y1])
                    labels.append(cat["cell"])
            calls[0] += 1
            outs.append(
                dict(
                    labels=np.asarray(labels, np.int64),
                    boxes=np.asarray(boxes, np.float32),
                    scores=np.full(len(boxes), 0.9, np.float32),
                )
            )
        return outs

    cell.postprocessor.filter_packed = filter_packed


def run_semantic_e2e(device="tpu", warmup=2, iters=8):
    """End-to-end TableSemanticParser (``yomitoku_extract``'s pipeline):
    image in, TableSemanticParserSchema out.  Returns (pipelined_page_s,
    latency_page_s, workload, stage_table)."""
    from yomitoku_tpu.table_semantic_parser import TableSemanticParser
    from yomitoku_tpu.utils.stagetrace import collect

    img, quads, paragraphs, tables, figure_box = _build_workload()
    parser = TableSemanticParser(device=device, visualize=False)
    _pin_semantic_parser(parser, img, quads, paragraphs, tables, figure_box)

    for _ in range(warmup):
        semantic, _, _ = parser(img)

    t0 = time.perf_counter()
    for _ in range(iters):
        parser(img)
    latency_s = (time.perf_counter() - t0) / iters

    parser.batch([img] * 2)  # warm the pipelined path
    rounds, stage_tables = [], []
    for _ in range(4):
        with collect() as stats:
            t0 = time.perf_counter()
            parser.batch([img] * iters)
            rounds.append((time.perf_counter() - t0) / iters)
        stage_tables.append(stats.table(pages=iters))
    # median window, same statistic as every other compared path
    median_idx = rounds.index(_median(rounds))

    workload = {
        "tables": len(semantic.tables),
        "grids": sum(len(t.grids) for t in semantic.tables),
        "kv_items": sum(len(t.kv_items) for t in semantic.tables),
        "cells": sum(len(t.cells) for t in semantic.tables),
        "paragraphs": len(semantic.paragraphs),
        "words": len(semantic.words),
        "windows_ms": [round(r * 1e3, 1) for r in rounds],
    }
    return (
        rounds[median_idx], latency_s, workload, stage_tables[median_idx]
    )


def early_exit_params(rec_model, k, char_id=5):
    """Deterministic PARSeq weights whose greedy decode emits ``char_id``
    for the first k-1 positions and EOS from position k-1 on — every AR
    loop exits after ~k steps, the way real pretrained weights exit at
    real Japanese line lengths (reference models/parseq.py:160-186).

    Construction: zero every residual contribution in the decoder
    (attention out-projections, MLP second layers), so the query stream
    carries the position-query embedding through the final LayerNorm
    unchanged; program the position rows with two orthogonal zero-mean
    ±1 patterns (text rows period 2, EOS rows period 4) and point the
    head's char/EOS columns at those patterns.  bf16-exact.
    """
    import jax

    params = jax.tree.map(np.array, rec_model.params)  # mutable copy
    p = params["params"]
    dec = p["decoder"]
    for name, layer in dec.items():
        if not name.startswith("layers_"):
            continue
        for sub, leaf in (("self_attn", "out_proj"), ("cross_attn", "out_proj"),
                          ("mlp", "fc2")):
            layer[sub][leaf]["kernel"][:] = 0.0
            layer[sub][leaf]["bias"][:] = 0.0
        for ln in ("norm_q",):
            layer[ln]["scale"][:] = 1.0
            layer[ln]["bias"][:] = 0.0
    dec["norm"]["scale"][:] = 1.0
    dec["norm"]["bias"][:] = 0.0

    pq = p["pos_queries"]  # (1, max_len+1, D)
    D = pq.shape[-1]
    v_text = np.tile([1.0, -1.0], D // 2)[:D]
    v_eos = np.tile([1.0, 1.0, -1.0, -1.0], D // 4 + 1)[:D]
    pq[0, :, :] = v_text
    pq[0, k - 1 :, :] = v_eos

    head = p["head"]
    head["kernel"][:] = 0.0
    head["bias"][:] = 0.0
    head["kernel"][:, 0] = v_eos * (10.0 / D)       # EOS id 0
    head["kernel"][:, char_id] = v_text * (10.0 / D)
    return params


def run_early_exit(k=25):
    """Recognizer throughput under realistic early exit (b128) and the
    verified exit step."""
    from yomitoku_tpu.config import structured
    from yomitoku_tpu.configs import TextRecognizerPARSeqLargeV41Config
    from yomitoku_tpu.models.parseq import PARSeq
    from yomitoku_tpu.utils.timing import device_time

    import jax.numpy as jnp

    rec = PARSeq(structured(TextRecognizerPARSeqLargeV41Config))
    rec.params = early_exit_params(rec, k)
    rng = np.random.RandomState(0)
    h, w = rec.core.img_size
    crops = jnp.asarray(rng.randint(0, 255, (128, h, w, 3), np.uint8))
    ids, _ = rec.forward_tokens(np.asarray(crops))
    # verify the crafted exit semantics before trusting the timing
    assert (ids[:, : k - 1] != 0).all() and (ids[:, k - 1] == 0).all(), (
        "early-exit weights mis-crafted: EOS not at step k"
    )
    s = device_time(
        lambda: rec._tokens_fn(rec.dparams, crops, True, 1), iters=10
    )
    return s, rec


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

    def _best(fn, iters):
        # min of 3 device_time windows: a single enqueue window can land
        # on a tunnel hiccup (one capture read RT-DETR at 6.8 ms vs its
        # stable 3.7)
        return min(device_time(fn, iters=iters) for _ in range(3))

    rng = np.random.RandomState(0)
    det = DBNet(structured(TextDetectorDBNetV2_1Config))
    det.params = det.init_params(0)
    page = jnp.asarray(rng.randint(0, 255, (1, 1280, 960, 3), np.uint8))
    det_s = _best(lambda: det._fwd_u8(det.dparams, page), 30)

    lay = RTDETRv2(structured(LayoutParserRTDETRv2V2Config))
    lay.params = lay.init_params(0)
    tile = jnp.asarray(rng.randint(0, 255, (1, 640, 640, 3), np.uint8))
    lay_s = _best(lambda: lay._fwd(lay.dparams, tile), 30)

    rec = PARSeq(structured(TextRecognizerPARSeqLargeV41Config))
    rec.params = rec.init_params(0)
    h, w = rec.core.img_size
    crops = jnp.asarray(rng.randint(0, 255, (128, h, w, 3), np.uint8))
    rec_s = _best(lambda: rec._tokens_fn(rec.dparams, crops, True, 1), 10)
    # width bucket (default-audited, text_recognizer._width_buckets):
    # encoder at half canvas — upper bound of the bucketed recognizer's
    # win on short-line pages
    crops_400 = crops[:, :, : w // 2]
    rec400_s = _best(
        lambda: rec._tokens_fn(rec.dparams, crops_400, True, 1), 10
    )
    # mixed-width routed schedule: the router's exact dispatch sequence
    # for a 112-short / 16-wide page (batch buckets pad the wide group to
    # 32) — 128@w/2 then 32@w, vs the unrouted single 128@w dispatch
    crops_wide32 = crops[:32]
    rec_routed_mixed_s = _best(
        lambda: (
            rec._tokens_fn(rec.dparams, crops_400, True, 1),
            rec._tokens_fn(rec.dparams, crops_wide32, True, 1),
        )[-1],
        10,
    )
    return det_s, lay_s, rec_s, rec400_s, rec_routed_mixed_s


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


def measure_practical_floor(stages, n_pages=9, depth=3):
    """Achievable per-page wall ms for the pipeline's TRANSFER schedule
    alone: the same per-page uploads/readbacks (byte-for-byte, sync-for-
    sync, taken from the measured stage table) driven by trivial device
    programs with zero host work, through a thread pipeline at the same
    depth DocumentAnalyzer.batch uses (passed in by main()).

    Reading the gaps: e2e - practical floor = framework overhead
    (host compute + device compute + imperfect overlap); practical floor
    - analytic link_floor = tunnel/client reality (chunking, acks, GIL
    during socket waits) that NO host pipeline on this link can cross.

    Window caveat: the floor replay runs in its OWN time window, and the
    tunnel's bandwidth swings 2-4x minute-to-minute — so e2e and floor
    each inherit their window's link speed, and an e2e median that lands
    in a faster window can come out BELOW the floor (BENCH_r03: 176 ms
    e2e vs 182 ms floor).  The floor is a same-schedule reference point
    with ± window variance, not a hard bound on any single e2e run."""
    import jax
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    # Transfer events from the stage table: a row's mb/n are per-page
    # totals over n events, so the whole replay pays round(n * n_pages)
    # transfers of the event size, spread evenly across the page tasks.
    # (n can be FRACTIONAL — the page-DP schedule uploads one stacked
    # buffer per chunk, i.e. n=0.5 uploads/page at chunk depth 2 — and
    # per-page rounding would double its bytes.)
    def _events(kind_wanted):
        per_page = [[] for _ in range(n_pages)]
        for row in stages.values():
            for kind, seg in row.items():
                if kind == kind_wanted:
                    n_total = max(
                        int(round(seg.get("n", 1.0) * n_pages)), 1
                    )
                    mb_each = seg.get("mb", 0.0) * n_pages / n_total
                    for j in range(n_total):
                        per_page[j * n_pages // n_total].append(mb_each)
        return per_page

    uploads = _events("upload")
    reads = _events("sync")

    # incompressible payloads: a compressing transport would make zero
    # buffers fly and overstate the achievable floor
    _rng = np.random.RandomState(0)
    up_bufs = [
        [
            _rng.randint(0, 256, (max(int(mb * 1e6), 8),), dtype=np.uint8)
            for mb in page_mbs
        ]
        for page_mbs in uploads
    ]
    read_ns = [
        [max(int(mb * 1e6), 8) for mb in page_mbs] for page_mbs in reads
    ]
    # readbacks tile the (random) upload so they are incompressible too
    expand = {
        n: jax.jit(lambda x, n=n: jnp.resize(x.reshape(-1), (n,)))
        for page in read_ns
        for n in page
    }

    def one_page(p):
        d = jax.device_put(np.zeros((8,), np.uint8))
        for b in up_bufs[p]:
            d = jax.device_put(b)
        total = 0
        for n in read_ns[p]:
            total += np.asarray(expand[n](d)).nbytes
        return total

    # warm every expand executable before timing (pages may use distinct
    # readback sizes)
    d0 = jax.device_put(np.zeros((8,), np.uint8))
    for fn in expand.values():
        np.asarray(fn(d0))
    one_page(0)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(depth) as ex:
        list(ex.map(one_page, range(n_pages)))
    return (time.perf_counter() - t0) / n_pages * 1e3


def _wait_for_device(max_wait_s=None):
    """Bounded device probe: the dev tunnel sometimes wedges for ~30 min
    and then even jax.devices() hangs indefinitely.  Probe enumeration in
    a daemon thread with a timeout, retrying up to max_wait_s
    (YOMITOKU_TPU_BENCH_DEVICE_WAIT_S, default 900); if the device never
    appears, emit an explicit error JSON line and exit instead of
    hanging the driver."""
    import threading

    if max_wait_s is None:
        max_wait_s = int(
            os.environ.get("YOMITOKU_TPU_BENCH_DEVICE_WAIT_S", "900")
        )
    import jax

    deadline = time.time() + max_wait_s
    errs = []

    def _probe(out):
        try:
            out.append(jax.devices())
        except Exception as e:  # fast failure, not a hang — pace retries
            errs.append(e)

    while True:
        got = []
        t = threading.Thread(target=_probe, args=(got,), daemon=True)
        t0 = time.time()
        t.start()
        t.join(max(min(60.0, deadline - time.time()), 0.1))
        if got:
            return got[0]
        if not t.is_alive():
            # backend errored instead of hanging; don't spin
            time.sleep(max(0.0, 5.0 - (time.time() - t0)))
        if time.time() >= deadline:
            reason = (
                f"jax.devices() raised {errs[-1]!r}"
                if errs
                else f"jax.devices() did not return within {max_wait_s}s"
            )
            print(
                json.dumps(
                    {
                        "metric": "doc_analyzer_e2e_pages_per_sec",
                        "value": 0.0,
                        "unit": "pages/sec",
                        "vs_baseline": 0.0,
                        "detail": {
                            "error": "device unavailable: " + reason
                        },
                    }
                )
            )
            sys.exit(3)


def main():
    from yomitoku_tpu.base import enable_compilation_cache

    # Time budget: the driver runs this under an external timeout, and a
    # cold XLA-compile-cache host pays ~10 min of compiles before the
    # first number.  The flagship e2e phase always runs; the optional
    # phases below are skipped (reported null + note) once the budget is
    # spent, so the one JSON line is printed no matter what.
    t_start = time.time()
    budget_s = float(os.environ.get("YOMITOKU_TPU_BENCH_BUDGET_S", "1650"))

    def budget_left():
        return budget_s - (time.time() - t_start)

    skipped = []

    _wait_for_device()
    enable_compilation_cache()

    link_lat_ms, link_bw_mbs = measure_link()
    (
        page_s, latency_s, workload, stages, early_page_s, dp_page_s,
        dp_stages,
    ) = run_e2e()
    pages_per_sec = 1.0 / page_s

    # TableSemanticParser pipeline: the expensive optional phase (the
    # CellDetector 2500-query program is a multi-minute cold compile).
    sem_page_s = sem_latency_s = None
    sem_workload = sem_stages = None
    if budget_left() > 240:
        try:
            sem_page_s, sem_latency_s, sem_workload, sem_stages = (
                run_semantic_e2e()
            )
        except Exception as e:  # keep the flagship line alive
            skipped.append(f"table_semantic: {type(e).__name__}")
    else:
        skipped.append("table_semantic: over budget")

    early_rec_s = None
    if budget_left() > 90:
        try:
            early_rec_s, _ = run_early_exit(k=25)
        except Exception as e:
            skipped.append(f"early_exit: {type(e).__name__}")
    else:
        skipped.append("early_exit: over budget")

    # link floor: per-page bytes at the measured bandwidth + one
    # round-trip per device sync — the best any host pipeline on this
    # tunnel could do for the same transfer schedule
    total_mb = sum(
        seg.get("mb", 0.0) for row in stages.values() for seg in row.values()
    )
    syncs = sum(
        seg["n"] for stage, row in stages.items() for kind, seg in row.items()
        if kind in ("sync", "upload")
    )
    link_floor_ms = total_mb / max(link_bw_mbs, 1e-6) * 1e3 + syncs * link_lat_ms
    # replay the floor at the SAME pipeline depth batch() actually uses
    import inspect

    from yomitoku_tpu.document_analyzer import DocumentAnalyzer as _DA

    depth = inspect.signature(_DA.batch).parameters["max_in_flight"].default
    practical_floor_ms = None
    if budget_left() > 90:
        try:
            practical_floor_ms = measure_practical_floor(stages, depth=depth)
        except Exception as e:
            skipped.append(f"practical_floor: {type(e).__name__}")
    else:
        skipped.append("practical_floor: over budget")

    # Bandwidth-independent efficiency ratios (VERDICT r4 #6): each
    # pipeline's e2e ms over the practical transfer floor of its OWN
    # measured schedule.  The floor replays inherit the link weather of
    # their window like any run, but the RATIO factors the schedule's
    # byte/sync cost out of the headline, making rounds comparable across
    # tunnel-bandwidth regimes.
    dp_floor_ms = sem_floor_ms = None
    if dp_stages is not None and budget_left() > 60:
        try:
            dp_floor_ms = measure_practical_floor(dp_stages, depth=depth)
        except Exception as e:
            skipped.append(f"dp_floor: {type(e).__name__}")
    if sem_stages is not None and budget_left() > 60:
        try:
            sem_floor_ms = measure_practical_floor(sem_stages, depth=depth)
        except Exception as e:
            skipped.append(f"sem_floor: {type(e).__name__}")

    def _ratio(ms_val, floor):
        if ms_val is None or not floor:
            return None
        return round(ms_val / floor, 2)

    det_s = lay_s = rec_s = rec400_s = rec_routed_mixed_s = None
    if budget_left() > 60:
        try:
            (
                det_s,
                lay_s,
                rec_s,
                rec400_s,
                rec_routed_mixed_s,
            ) = run_device_composite()
        except Exception as e:
            skipped.append(f"device_composite: {type(e).__name__}")
    else:
        skipped.append("device_composite: over budget")
    device_page_s = (
        det_s + 3 * lay_s + rec_s if det_s is not None else None
    )

    cpu_page_s = (
        TORCH_CPU_DET_S
        + 3 * TORCH_CPU_RTDETR_S
        + 128 / TORCH_CPU_PARSEQ_LARGE_LPS
    )

    def inv(x, nd=2):
        return round(1.0 / x, nd) if x else None

    def ms(x, nd=1):
        return round(x * 1e3, nd) if x is not None else None

    print(
        json.dumps(
            {
                "metric": "doc_analyzer_e2e_pages_per_sec",
                "value": round(pages_per_sec, 2),
                "unit": "pages/sec",
                "vs_baseline": round(pages_per_sec * cpu_page_s, 1),
                "detail": {
                    "e2e_pipelined_page_ms": ms(page_s),
                    "e2e_single_page_latency_ms": ms(latency_s),
                    "link_roundtrip_ms": link_lat_ms,
                    "link_bandwidth_mb_s": link_bw_mbs,
                    "stages_per_page": stages,
                    "link_floor_ms_per_page": round(link_floor_ms, 1),
                    "practical_transfer_floor_ms_per_page": (
                        round(practical_floor_ms, 1)
                        if practical_floor_ms is not None
                        else None
                    ),
                    # measured in its own time window on a link whose
                    # bandwidth swings 2-4x minute-to-minute: e2e medians
                    # landing in a faster window can undercut it (see
                    # measure_practical_floor docstring)
                    "floor_note": "same-schedule reference +- link-window variance, not a per-run bound",
                    "value_note": "median of 4 interleaved + 1 time-spaced batch() windows; dp path alternates with batch() window-by-window (paired A/B, ratios in workload); early-exit and table-semantic report their window medians too",
                    "e2e_over_floor_ratio": _ratio(
                        page_s * 1e3, practical_floor_ms
                    ),
                    "dp_over_floor_ratio": _ratio(
                        dp_page_s * 1e3 if dp_page_s else None, dp_floor_ms
                    ),
                    "dp_floor_ms_per_page": (
                        round(dp_floor_ms, 1) if dp_floor_ms else None
                    ),
                    "dp_stages_per_page": dp_stages,
                    "table_semantic_over_floor_ratio": _ratio(
                        sem_page_s * 1e3 if sem_page_s else None,
                        sem_floor_ms,
                    ),
                    "table_semantic_floor_ms_per_page": (
                        round(sem_floor_ms, 1) if sem_floor_ms else None
                    ),
                    "workload": workload,
                    "table_semantic_e2e_pages_per_sec": inv(sem_page_s),
                    "table_semantic_e2e_pipelined_page_ms": ms(sem_page_s),
                    "table_semantic_single_page_latency_ms": ms(sem_latency_s),
                    "table_semantic_stages_per_page": sem_stages,
                    "table_semantic_workload": sem_workload,
                    "device_composite_pages_per_sec": inv(device_page_s),
                    "dbnet_1280x960_ms": ms(det_s, 2),
                    "rtdetr_640_ms": ms(lay_s, 2),
                    "parseq_large_b128_lines_per_sec": (
                        round(128 / rec_s, 1) if rec_s else None
                    ),
                    # width bucket (audited default; short-line upper
                    # bound; see text_recognizer._width_buckets)
                    "parseq_large_b128_lines_per_sec_w400": (
                        round(128 / rec400_s, 1) if rec400_s else None
                    ),
                    # mixed 112-short/16-wide page through the router's
                    # exact dispatch schedule (128@400 + 32@800)
                    "parseq_large_b128_lines_per_sec_routed_mixed": (
                        round(128 / rec_routed_mixed_s, 1)
                        if rec_routed_mixed_s
                        else None
                    ),
                    "routed_mixed_vs_unrouted": (
                        round(rec_s / rec_routed_mixed_s, 2)
                        if rec_s and rec_routed_mixed_s
                        else None
                    ),
                    "parseq_large_b128_lines_per_sec_earlyexit_k25": (
                        round(128 / early_rec_s, 1) if early_rec_s else None
                    ),
                    "e2e_pages_per_sec_earlyexit_k25": inv(early_page_s),
                    # page-DP path A/B on one chip (chunked fused batches,
                    # pipelined; the dp mesh shards the same program
                    # page-parallel)
                    "dp_batch_pages_per_sec": inv(dp_page_s),
                    "torch_cpu_page_s_lower_bound": round(cpu_page_s, 1),
                    "skipped_phases": skipped or None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
