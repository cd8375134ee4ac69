"""DocumentAnalyzer: the full-page pipeline.

Behavioral contract: reference yomitoku/document_analyzer.py — detector ∥
layout analysis, optional split of detected quads at table-cell
boundaries, recognition, aggregation (words -> cells/paragraphs by
0.5-containment, ruby filtering, figures absorbing contained paragraphs,
reading order with header/body/footer offsets).  Pinned by the
differential fuzz in tests/test_aggregate_differential.py.

TPU-host redesign: where the reference walks O(elements x words) Python
pair loops, everything geometric here is matrix-first — one containment
matrix (utils.misc.overlap_ratio_matrix) drives word->cell/paragraph
assignment, figure absorption, and the table-boundary quad splitting;
size statistics for the ruby filter run as numpy histogram/median ops.
Detector and layout run concurrently in a 2-worker thread pool; each is
its own jitted XLA program so the host threads just drive dispatch.
"""

import asyncio
import math
import os
import re
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .layout_analyzer import LayoutAnalyzer
from .ocr import OCRSchema, ocr_aggregate
from .reading_order import prediction_reading_order
from .schemas import DocumentAnalyzerSchema, FigureSchema, ParagraphSchema
from .text_detector import TextDetector
from .text_recognizer import TextRecognizer
from .utils.misc import containment_matrix, overlap_ratio_matrix, quad_to_xyxy


def combine_flags(flag1, flag2):
    return [f1 or f2 for f1, f2 in zip(flag1, flag2)]


def _box_areas(elements):
    """(N,) float areas of .box xyxy attributes."""
    if not elements:
        return np.zeros(0)
    b = np.asarray([e.box for e in elements], np.float64)
    return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])


def judge_page_direction(paragraphs):
    """The direction covering more total paragraph area wins; anything
    not explicitly "horizontal" (including None) counts as vertical, and
    the tie goes to horizontal."""
    areas = _box_areas(paragraphs)
    horiz = np.fromiter(
        (p.direction == "horizontal" for p in paragraphs), bool, len(areas)
    )
    return "vertical" if areas[~horiz].sum() > areas[horiz].sum() else "horizontal"


def extract_paragraph_within_figure(paragraphs, figures):
    """Each figure absorbs the paragraphs 0.7-contained in it (shared
    objects, re-ordered internally by the figure's own voted direction).
    Returns (figure schemas, per-paragraph absorbed mask)."""
    inside = containment_matrix(
        [f.box for f in figures], [p.box for p in paragraphs], threshold=0.7
    )
    new_figures = []
    for figure, row in zip(figures, inside):
        members = [paragraphs[i] for i in np.nonzero(row)[0]]
        direction = judge_page_direction(members)
        prediction_reading_order(
            members, "left2right" if direction == "horizontal" else "right2left"
        )
        new_figures.append(
            FigureSchema(
                box=figure.box, order=0, direction=direction,
                paragraphs=sorted(members, key=lambda p: p.order),
            )
        )
    absorbed = inside.any(axis=0) if len(figures) else np.zeros(len(paragraphs), bool)
    return new_figures, absorbed.tolist()


#: a pure-kana token: entirely hiragana, or entirely katakana
_RE_KANA_ONLY = re.compile(r"^(?:[぀-ゟ]+|[゠-ヿ]+)$")


def _upper_median(values):
    """sorted(values)[n // 2] — the upper-median convention the size
    statistics use throughout."""
    return np.sort(values)[values.size // 2]


def _compute_ruby_threshold(sizes, k):
    """Size cut separating a furigana mode from the body-text mode.

    The log-size histogram is scanned for its two dominant peaks; when
    the valley between them is deep enough (peak mass / valley mass >=
    ``k``) the split lands at the valley center, otherwise — and when no
    second peak exists at all — a robust median - 2*MAD cut is used.
    Returns None when no defensible split exists."""
    s = np.asarray(sizes, np.float64)
    if s.size < 3:
        return None
    logs = np.log(s)
    lo, hi = logs.min(), logs.max()
    if hi - lo < 1e-9:
        return None
    nbins = max(8, int(math.sqrt(s.size)))
    width = (hi - lo) / nbins
    bins = np.minimum(((logs - lo) / width).astype(np.int64), nbins - 1)
    hist = np.bincount(bins, minlength=nbins)

    p1 = int(hist.argmax())
    eligible = np.abs(np.arange(nbins) - p1) >= 2
    if not eligible.any():
        return _mad_cut(s)
    p2 = int(np.where(eligible, hist, -1).argmax())
    a, b = sorted((p1, p2))
    if b - a <= 1:
        return _mad_cut(s)
    between = hist[a + 1 : b]
    ties = np.nonzero(between == between.min())[0]
    valley = a + 1 + int(ties[ties.size // 2])
    bimodality = (hist[p1] + hist[p2]) / (2 * hist[valley] + 1e-6)
    if bimodality >= k:
        return math.exp(lo + (valley + 0.5) * width)
    return _mad_cut(s)


def _mad_cut(s):
    """median - 2*MAD, or None when the center/spread collapses."""
    med = _upper_median(s)
    if med == 0:
        return None
    mad = _upper_median(np.abs(s - med))
    if mad == 0:
        return None
    cut = med - 2 * mad
    return float(cut) if cut > 0 else None


# back-compat alias (reference name)
_mad_threshold = _mad_cut


def filter_ruby(contained_words, element_direction, ruby_threshold):
    """Drop words that sit below the furigana size split AND consist of
    kana only (spaces ignored).  ``element_direction`` is unused but kept
    for signature parity."""
    if len(contained_words) <= 1:
        return contained_words
    area = _box_areas(contained_words)
    with np.errstate(invalid="ignore"):
        sizes = np.sqrt(area)
    positive = sizes[sizes > 0]
    if positive.size < 2:
        return contained_words
    cut = _compute_ruby_threshold(positive, ruby_threshold)
    if cut is None:
        return contained_words
    small = (sizes > 0) & (sizes < cut)
    return [
        w for w, is_small in zip(contained_words, small)
        if not (is_small and _RE_KANA_ONLY.match(w.contents.replace(" ", "")))
    ]


class _BlockWord:
    """Slotted stand-in for ParagraphSchema in the per-block ordering hot
    path: aggregate() orders the member words of EVERY cell/paragraph, and
    pydantic construction + validate_assignment on ``.order`` writes was
    ~half the measured aggregate cost (r3 bench: 37.5 ms/page)."""

    __slots__ = ("box", "contents", "direction", "order")

    def __init__(self, box, contents, direction):
        self.box = box
        self.contents = contents
        self.direction = direction
        self.order = 0


def _assemble_text_block(words, word_boxes, member_idx, ignore_ruby,
                         ruby_threshold):
    """Compose the text block for one element from its member word
    indices: majority direction vote (ties vertical), optional ruby
    filtering, intra-element reading order, newline join.  Returns
    (text, direction) — (None, None) when nothing remains."""
    if len(member_idx) == 0:
        return None, None
    members = [
        _BlockWord(word_boxes[i], words[i].content, words[i].direction)
        for i in member_idx
    ]
    n_horizontal = sum(m.direction == "horizontal" for m in members)
    n_vertical = sum(m.direction == "vertical" for m in members)
    direction = "horizontal" if n_horizontal > n_vertical else "vertical"
    if ignore_ruby:
        members = filter_ruby(members, direction, ruby_threshold)
        if not members:
            return None, None
    prediction_reading_order(
        members, "left2right" if direction == "horizontal" else "right2left"
    )
    members.sort(key=lambda m: m.order)
    return "\n".join(m.contents for m in members), direction


def extract_words_within_element(
    pred_words, element, ignore_ruby=False, ruby_threshold=2.0,
    word_boxes=None,
):
    """API-parity wrapper over ``_assemble_text_block``: selects the words
    0.5-contained in ``element`` and composes their text block.  Callers
    looping over many elements should precompute ``word_boxes`` once
    (aggregate() builds one containment matrix for ALL elements instead)."""
    if not pred_words:
        return None, None, []
    if word_boxes is None:
        word_boxes = [quad_to_xyxy(w.points) for w in pred_words]
    inside = containment_matrix([element.box], word_boxes, threshold=0.5)[0]
    text, direction = _assemble_text_block(
        pred_words, word_boxes, np.nonzero(inside)[0], ignore_ruby,
        ruby_threshold,
    )
    return text, direction, inside.tolist()


def _quad_edges(points):
    """(N,4,2) float quads -> (quads, widths, heights) where width/height
    are the p0-p1 / p1-p2 edge norms."""
    q = np.asarray(points, np.float64).reshape(-1, 4, 2)
    w = np.linalg.norm(q[:, 0] - q[:, 1], axis=1)
    h = np.linalg.norm(q[:, 1] - q[:, 2], axis=1)
    return q, w, h


def is_vertical(quad, thresh_aspect=2):
    _, w, h = _quad_edges([quad])
    return bool(h[0] > w[0] * thresh_aspect)


def is_noise(quad, thresh=15):
    _, w, h = _quad_edges([quad])
    return bool(w[0] < thresh or h[0] < thresh)


def recursive_update(original, new_data):
    for key, value in new_data.items():
        if (
            isinstance(value, dict)
            and key in original
            and isinstance(original[key], dict)
        ):
            recursive_update(original[key], value)
        else:
            original[key] = value
    return original


_NOISE_MIN_EDGE = 15  # min clipped-piece edge norm (reference is_noise)


def _clip_quads_to_cells(quads, scores, lines, cells, axis):
    """Clip word quads to the cells of their best-overlapping table line.

    ``axis`` 0: horizontal words, allocated to a row by overlap, clipped
    in x against every cell whose row-span covers that row.  ``axis`` 1:
    vertical words vs columns, clipped in y.  Pieces shorter than the
    noise floor on either edge are dropped.  Fully vectorized over the
    (word x cell) pair grid; emission order is word-major then cell order,
    matching the reference's nested loops."""
    if len(quads) == 0 or not lines or not cells:
        return [], []
    boxes = np.concatenate([quads.min(axis=1), quads.max(axis=1)], axis=1)
    # fraction of each word box covered by each line (reference allocates
    # by calc_overlap_ratio against the word box, first argmax wins)
    ratio = overlap_ratio_matrix([ln.box for ln in lines], boxes)
    alloc = ratio.argmax(axis=0)

    start = np.asarray([c.row if axis == 0 else c.col for c in cells])
    span = np.asarray(
        [c.row_span if axis == 0 else c.col_span for c in cells]
    )
    line_no = alloc[:, None] + 1  # 1-based
    covers = (start[None, :] <= line_no) & (line_no < start[None, :] + span[None, :])

    # integer intersection intervals per (word, cell), calc_intersection
    # truncation semantics; empty on either axis kills the pair
    wb = np.trunc(boxes).astype(np.int64)
    cb = np.trunc(np.asarray([c.box for c in cells], np.float64)).astype(np.int64)
    lo = np.maximum(wb[:, None, :2], cb[None, :, :2])
    hi = np.minimum(wb[:, None, 2:], cb[None, :, 2:])
    pairs = covers & (hi > lo).all(axis=2)

    wi, ci = np.nonzero(pairs)
    if wi.size == 0:
        return [], []
    pieces = quads[wi].copy()
    # clip the two leading/trailing corners along the chosen axis
    head, tail = ((0, 3), (1, 2)) if axis == 0 else ((0, 1), (2, 3))
    pieces[:, head, axis] = np.maximum(
        pieces[:, head, axis], lo[wi, ci, axis, None]
    )
    pieces[:, tail, axis] = np.minimum(
        pieces[:, tail, axis], hi[wi, ci, axis, None]
    )
    pw = np.linalg.norm(pieces[:, 0] - pieces[:, 1], axis=1)
    ph = np.linalg.norm(pieces[:, 1] - pieces[:, 2], axis=1)
    keep = np.nonzero((pw >= _NOISE_MIN_EDGE) & (ph >= _NOISE_MIN_EDGE))[0]
    return [pieces[i].tolist() for i in keep], [scores[wi[i]] for i in keep]


def _split_text_across_cells(results_det, results_layout):
    """Split detected quads at table row/col boundaries so each piece
    lands in a single cell; words outside every table pass through."""
    n = len(results_det.points)
    if n == 0:
        return results_det
    quads, edge_w, edge_h = _quad_edges(results_det.points)
    vertical = edge_h > 2 * edge_w
    boxes = np.concatenate([quads.min(axis=1), quads.max(axis=1)], axis=1)
    scores = list(results_det.scores)

    in_any_table = np.zeros(n, bool)
    new_points, new_scores = [], []
    for table in results_layout.tables:
        inside = overlap_ratio_matrix([table.box], boxes)[0] > 0.5
        in_any_table |= inside
        for mask, lines, axis in (
            (inside & ~vertical, table.rows, 0),
            (inside & vertical, table.cols, 1),
        ):
            idx = np.nonzero(mask)[0]
            pts, scs = _clip_quads_to_cells(
                quads[idx], [scores[i] for i in idx], lines, table.cells,
                axis,
            )
            new_points.extend(pts)
            new_scores.extend(scs)

    for i in np.nonzero(~in_any_table)[0]:
        new_points.append(results_det.points[i])
        new_scores.append(scores[i])

    results_det.points = new_points
    results_det.scores = new_scores
    return results_det


class DocumentAnalyzer:
    def __init__(
        self,
        configs=None,
        device="tpu",
        visualize=False,
        num_devices=None,
        ignore_meta=False,
        reading_order="auto",
        split_text_across_cells=False,
        ignore_ruby=False,
        ruby_threshold=2.0,
    ):
        common = {"device": device, "visualize": visualize,
                  "num_devices": num_devices}
        default_configs = {
            "ocr": {
                "text_detector": dict(common),
                "text_recognizer": dict(common),
            },
            "layout_analyzer": {
                "layout_parser": dict(common),
                "table_structure_recognizer": dict(common),
            },
        }
        self.reading_order = reading_order
        if configs is not None:
            if not isinstance(configs, dict):
                raise ValueError("configs must be a dict.")
            recursive_update(default_configs, configs)

        self.text_detector = TextDetector(**default_configs["ocr"]["text_detector"])
        self.text_recognizer = TextRecognizer(
            **default_configs["ocr"]["text_recognizer"]
        )
        self.layout = LayoutAnalyzer(configs=default_configs["layout_analyzer"])
        self.visualize = visualize
        self.num_devices = num_devices
        self.ignore_meta = ignore_meta
        self.split_text_across_cells = split_text_across_cells
        self.ignore_ruby = ignore_ruby
        self.ruby_threshold = ruby_threshold
        self.img = None  # reference-API compat attribute; never read
        self._fused_page_lock = threading.Lock()

    def aggregate(self, ocr_res, layout_res):
        """Assign words to table cells and layout paragraphs, then order
        the page.  One containment matrix covers every (element, word)
        pair; each element's members come from its row."""
        words = ocr_res.words
        word_boxes = [quad_to_xyxy(w.points) for w in words]
        cells = [c for table in layout_res.tables for c in table.cells]
        inside = containment_matrix(
            [c.box for c in cells] + [p.box for p in layout_res.paragraphs],
            word_boxes, threshold=0.5,
        )
        claimed = np.zeros(len(words), bool)

        def _block(row):
            return _assemble_text_block(
                words, word_boxes, np.nonzero(row)[0],
                self.ignore_ruby, self.ruby_threshold,
            )

        # cells claim their contained words even when ruby filtering
        # empties the block
        for cell, row in zip(cells, inside):
            text, _ = _block(row)
            cell.contents = text if text is not None else ""
            claimed |= row

        # a paragraph whose block comes back empty claims nothing
        paragraphs = []
        for paragraph, row in zip(layout_res.paragraphs, inside[len(cells):]):
            text, direction = _block(row)
            if text is None:
                continue
            claimed |= row
            paragraphs.append(
                ParagraphSchema(
                    contents=text,
                    box=paragraph.box,
                    direction=direction,
                    order=0,
                    role=paragraph.role,
                )
            )

        # every unclaimed word becomes its own paragraph
        for i in np.nonzero(~claimed)[0]:
            paragraphs.append(
                ParagraphSchema(
                    contents=words[i].content,
                    box=word_boxes[i],
                    direction=words[i].direction,
                    order=0,
                    role=None,
                )
            )

        figures, check_list = extract_paragraph_within_figure(
            paragraphs, layout_res.figures
        )
        paragraphs = [p for p, f in zip(paragraphs, check_list) if not f]

        page_direction = judge_page_direction(paragraphs)

        headers = [
            p for p in paragraphs if p.role == "page_header" and not self.ignore_meta
        ]
        footers = [
            p for p in paragraphs if p.role == "page_footer" and not self.ignore_meta
        ]
        page_contents = [
            p for p in paragraphs if p.role is None or p.role == "section_headings"
        ]
        elements = page_contents + layout_res.tables + figures

        prediction_reading_order(headers, "left2right")
        prediction_reading_order(footers, "left2right")

        if self.reading_order == "auto":
            reading_order = (
                "right2left" if page_direction == "vertical" else "top2bottom"
            )
        else:
            reading_order = self.reading_order
        prediction_reading_order(elements, reading_order)

        for element in elements:
            element.order += len(headers)
        for footer in footers:
            footer.order += len(elements) + len(headers)

        paragraphs = sorted(headers + page_contents + footers, key=lambda x: x.order)
        figures = sorted(figures, key=lambda x: x.order)
        tables = sorted(layout_res.tables, key=lambda x: x.order)

        return {
            "paragraphs": paragraphs,
            "tables": tables,
            "figures": figures,
            "words": ocr_res.words,
        }

    def _ensure_fused_program(self):
        # double-checked lock: batch() runs up to 3 concurrent pages, and
        # an unguarded lazy init would build (and XLA-compile) the large
        # fused program once per racing thread
        if getattr(self, "_fused_page_program", None) is None:
            with self._fused_page_lock:
                if getattr(self, "_fused_page_program", None) is None:
                    from .ops.fused_page import FusedPageAnalysis

                    det = self.text_detector
                    lp = self.layout.layout_parser
                    tsr = self.layout.table_structure_recognizer
                    table_label = next(
                        i for i, c in lp.label_mapper.items() if c == "tables"
                    )
                    self._fused_page_program = FusedPageAnalysis(
                        det.model, lp.model, tsr.model,
                        lay_top_k=lp.postprocessor.num_top_queries,
                        tsr_top_k=tsr.postprocessor.num_top_queries,
                        table_label=table_label,
                        lay_thresh=lp.thresh_score,
                    )
        return self._fused_page_program

    def _fused_host_postwire(self, img, page, prob, packed, packed_t, sel,
                             sel_valid):
        """Per-page host side of the fused wire: layout filter, TSR slot
        match (misses fall back to chunked region dispatch, overlapped
        with the contour pass), DBNet contours, split-across-cells.

        ``page`` is any object with a ``.dev`` uint8 device page (a
        DevicePage, or one lane of a stacked DP page batch).  Returns
        (results_det, results_layout, layout_schema)."""
        from .ops.device_crop import (
            collect_filtered_regions,
            dispatch_regions_from_page,
        )
        from .schemas import LayoutAnalyzerSchema, LayoutParserSchema, TextDetectorSchema
        from .utils.stagetrace import segment

        det = self.text_detector
        lp = self.layout.layout_parser
        tsr = self.layout.table_structure_recognizer
        ori_h, ori_w = img.shape[:2]
        tsr_hw = tuple(tsr._cfg.data.img_size)

        outputs = lp.postprocessor.filter_packed(
            packed, [[ori_w, ori_h]], lp.thresh_score
        )
        results_layout = LayoutParserSchema(**lp.filtering_elements(outputs[0]))

        # match each kept table to its device slot by the (identically
        # truncated+clamped) box; misses fall back to region dispatch
        tsr_data = tsr._preprocess_meta(
            img, [t.box for t in results_layout.tables]
        )
        prog = self._ensure_fused_program()
        filtered, missing_idx, missing_data = prog.consume_region_slots(
            tsr_data, packed_t, sel, sel_valid, tsr.postprocessor,
            tsr.thresh_score,
        )
        chunks = (
            dispatch_regions_from_page(tsr.model, page, missing_data, tsr_hw)
            if missing_data
            else []
        )

        with segment("det", "contours"):
            quads, scores = det.postprocess({"binary": prob}, (ori_h, ori_w))
        results_det = TextDetectorSchema(points=quads, scores=scores)

        if missing_data:
            for i, one in zip(
                missing_idx,
                collect_filtered_regions(
                    chunks, tsr.postprocessor, tsr.thresh_score
                ),
            ):
                filtered[i] = one
        tables = tsr.tables_from_filtered(tsr_data, filtered)
        layout_schema = LayoutAnalyzerSchema(
            paragraphs=results_layout.paragraphs,
            tables=tables,
            figures=results_layout.figures,
        )

        if self.split_text_across_cells:
            results_det = _split_text_across_cells(results_det, layout_schema)
        return results_det, results_layout, layout_schema

    def _run_fused(self, img, page):
        """Single-dispatch page path (accelerator default): det, layout,
        AND the TSR table crops run as ONE device program with ONE
        readback (ops.fused_page.FusedPageAnalysis) — the program itself
        selects the table-classified layout detections and runs TSR on a
        fixed number of crop slots, so the host never pays the
        layout-readback -> TSR-dispatch round trip.  Tables the slots
        missed (more than max_tables, or host-side dedup disagreements)
        fall back to the chunked region path, overlapped with the
        contour pass."""
        from .utils.stagetrace import segment

        det = self.text_detector
        lp = self.layout.layout_parser
        tsr = self.layout.table_structure_recognizer
        prog = self._ensure_fused_program()

        ori_h, ori_w = img.shape[:2]
        from .data.functions import shortest_edge_size

        det_hw = shortest_edge_size(
            ori_h, ori_w,
            det._cfg.data.shortest_size, det._cfg.data.limit_size,
        )
        tsr_hw = tuple(tsr._cfg.data.img_size)
        wire = prog(
            page, page.hw, det_hw, tuple(lp._cfg.data.img_size), tsr_hw
        )
        results_det, results_layout, layout_schema = self._fused_host_postwire(
            img, page, *wire
        )
        tables = layout_schema.tables

        vis_det = None
        layout_vis = None
        if self.visualize:
            from .utils.visualizer import (
                det_visualizer,
                layout_visualizer,
                table_visualizer,
            )

            vis_det = det_visualizer(img, results_det.points)
            layout_vis = layout_visualizer(results_layout, img)
            for table in tables:
                layout_vis = table_visualizer(layout_vis, table)

        results_rec, ocr = self.text_recognizer(
            img, results_det.points, vis_det, page=page
        )
        with segment("aggregate", "host"):
            results_ocr = OCRSchema(
                words=ocr_aggregate(results_det, results_rec)
            )
            outputs = self.aggregate(results_ocr, layout_schema)
        return DocumentAnalyzerSchema(**outputs), ocr, layout_vis

    @staticmethod
    def _fused_page_enabled():
        import os

        return not os.environ.get("YOMITOKU_TPU_NO_FUSED_PAGE")

    async def run(self, img):
        from .ops.device_crop import DevicePage, device_crops_enabled

        # one uint8 page upload shared by detector, layout, TSR, and
        # recognizer programs (each otherwise uploads its own resize/crops)
        page = DevicePage(img) if device_crops_enabled() else None
        if page is not None and self._fused_page_enabled():
            return self._run_fused(img, page)
        with ThreadPoolExecutor(max_workers=2) as executor:
            loop = asyncio.get_running_loop()
            tasks = [
                loop.run_in_executor(executor, self.text_detector, img, page),
                loop.run_in_executor(executor, self.layout, img, page),
            ]
            results = await asyncio.gather(*tasks)
            results_det, _ = results[0]
            results_layout, layout = results[1]

            if self.split_text_across_cells:
                results_det = _split_text_across_cells(results_det, results_layout)

            vis_det = None
            if self.visualize:
                from .utils.visualizer import det_visualizer

                vis_det = det_visualizer(img, results_det.points)

            results_rec, ocr = self.text_recognizer(
                img, results_det.points, vis_det, page=page
            )
            from .utils.stagetrace import segment

            with segment("aggregate", "host"):
                results_ocr = OCRSchema(
                    words=ocr_aggregate(results_det, results_rec)
                )
                outputs = self.aggregate(results_ocr, results_layout)

        return DocumentAnalyzerSchema(**outputs), ocr, layout

    def __call__(self, img):
        # NOTE: unlike the reference (document_analyzer.py:637), the
        # current page is NOT stashed on self — nothing reads it, and the
        # mutation made concurrent __call__s racy (SURVEY §5).  batch()
        # relies on this being thread-safe.
        results, ocr, layout = asyncio.run(self.run(img))
        if self.visualize:
            from .utils.visualizer import reading_order_visualizer

            layout = reading_order_visualizer(layout, results)
        return results, ocr, layout

    def batch(self, imgs, max_in_flight=4):
        """Pipelined multi-page analysis: up to ``max_in_flight`` pages
        run concurrently so one page's host stages (contours, crops,
        tokenizer, aggregation) overlap another page's device programs
        and transfers.  The jitted programs are shared (same compiled
        executables); XLA queues their dispatches FIFO.  Depth swept on
        the transfer-bound tunnel after the round-3 host/device cuts:
        3 = 186 ms/page, 4 = 169, 5 = 166, 6 = 220 (queue contention) —
        4 balances the ~10% win against in-flight memory.

        Returns the list of (DocumentAnalyzerSchema, ocr_vis, layout_vis)
        in input order.  No multi-device requirement — this hides
        host<->device latency even on a single chip.  With
        ``num_devices`` > 1 the page axis itself goes data-parallel
        (``_batch_dp``): same-bucket pages stack into one det forward,
        every page's layout tile / table crop / line crop into one
        sharded batch per stage, so all chips work on every stage
        (SURVEY §2.3 "DP over pages").
        """
        if not imgs:
            return []
        if (
            self.num_devices
            and self.num_devices > 1
            and len(imgs) > 1
            and not self.visualize
        ):
            return self._batch_dp(imgs)

        def _one(img):
            results, ocr, layout = asyncio.run(self.run(img))
            if self.visualize:
                from .utils.visualizer import reading_order_visualizer

                layout = reading_order_visualizer(layout, results)
            return results, ocr, layout

        with ThreadPoolExecutor(max_workers=max_in_flight) as executor:
            return list(executor.map(_one, imgs))

    def _batch_dp(self, imgs):
        """Page-parallel analysis: fused device path when device crops are
        on (the round-3 kernels — DevicePage uploads, separable MXU
        crops, one det+layout+TSR program per page chunk, sharded over
        dp), host-crop stage batching otherwise (CPU backend)."""
        from .ops.device_crop import device_crops_enabled

        if device_crops_enabled() and self._fused_page_enabled():
            return self._batch_dp_fused(imgs)
        return self._batch_dp_host(imgs)

    def _batch_dp_fused(self, imgs):
        """Page-axis DP over the FUSED device path.

        Pages group by (padded page-shape bucket, det /32 bucket) and run
        in chunks of dp pages through ONE batched fused program dispatch
        (ops.fused_page.FusedPageAnalysis.batch_call, a page-axis vmap of
        the single-page program): the stacked uint8 page batch is placed
        dp-sharded, so each chip runs det + layout + its pages' TSR slot
        crops with zero cross-chip collectives.  Line recognition then
        dispatches per page with the homography batch dp-sharded
        (models/parseq.py place_batch) — every chip decodes a slice of
        each page's lines from the (ICI-broadcast) page.  Host
        postprocessing (contours, tokenizer, aggregation) stays per-page
        on the host, overlapped across the chunk.

        Without a mesh (single chip) the same path batches up to 4 pages
        per dispatch — deeper device batching than the threaded
        per-page pipeline, same kernels."""
        from types import SimpleNamespace

        import jax
        import jax.numpy as jnp

        from .data.functions import shortest_edge_size
        from .ops.device_crop import pad_page
        from .parallel import dp_mesh
        from .parallel.mesh import batch_sharding

        prog = self._ensure_fused_program()
        det = self.text_detector
        lp = self.layout.layout_parser
        tsr = self.layout.table_structure_recognizer
        mesh = dp_mesh(self.num_devices)
        if mesh is not None:
            chunk_pages = mesh.shape["dp"]
        else:
            # single chip: chunk depth trades dispatch count against
            # per-leg latency; a paired sweep (chunk x depth x tails,
            # interleaved with batch() for shared link weather) measured
            # chunk=1 with 4-deep device legs at parity with the threaded
            # batch() schedule, while chunk>=2 paid 20-100% — the bigger
            # leg's upload+sync serializes behind the previous leg's on
            # the transfer-bound tunnel.  A real dp mesh keeps chunk =
            # mesh dp size (the legs shard, they don't serialize).
            chunk_pages = int(os.environ.get("YOMITOKU_TPU_DP_CHUNK", "1"))
            chunk_pages = max(1, min(len(imgs), chunk_pages))
        lay_hw = tuple(lp._cfg.data.img_size)
        tsr_hw = tuple(tsr._cfg.data.img_size)

        from collections import defaultdict

        groups = defaultdict(list)
        padded = {}
        for i, img in enumerate(imgs):
            h, w = img.shape[:2]
            det_hw = shortest_edge_size(
                h, w, det._cfg.data.shortest_size, det._cfg.data.limit_size
            )
            padded[i] = pad_page(img)
            groups[(padded[i].shape, det_hw)].append(i)

        def _post_one(i, page_view, wire):
            # host tail of one page: contour/unpack readback, recognizer
            # dispatch+sync, tokenize, aggregation — all thread-safe (the
            # threaded batch() path exercises the same calls concurrently)
            results_det, _, layout_schema = self._fused_host_postwire(
                imgs[i], page_view, *wire
            )
            results_rec, _ = self.text_recognizer(
                imgs[i], results_det.points, None, page=page_view
            )
            results_ocr = OCRSchema(
                words=ocr_aggregate(results_det, results_rec)
            )
            outputs = self.aggregate(results_ocr, layout_schema)
            return (DocumentAnalyzerSchema(**outputs), None, None)

        def _device_leg(ids, det_hw):
            # pad the chunk to the program's page count by repeating the
            # first page (keeps ONE compiled program per bucket; padded
            # lanes' outputs are dropped)
            pad_ids = ids + [ids[0]] * (chunk_pages - len(ids))
            stack = np.stack([padded[i] for i in pad_ids])
            from .utils.stagetrace import segment

            with segment("page", "upload", nbytes=stack.nbytes):
                if mesh is not None:
                    pages_dev = jax.device_put(
                        stack, batch_sharding(mesh, stack.ndim)
                    )
                else:
                    pages_dev = jnp.asarray(stack)
                jax.block_until_ready(pages_dev)
            hws = [imgs[i].shape[:2] for i in pad_ids]
            per_page = prog.batch_call(
                pages_dev, hws, det_hw, lay_hw, tsr_hw
            )
            return pages_dev, per_page

        chunks = [
            (members[s : s + chunk_pages], det_hw)
            for (_, det_hw), members in groups.items()
            for s in range(0, len(members), chunk_pages)
        ]

        # Two-stage pipeline.  The chunk device legs (page upload, fused
        # dispatch, multi-MB wire sync) run in their OWN worker threads,
        # ``dev_depth`` deep, so chunk k+1's upload/dispatch/sync overlaps
        # both chunk k's sync and chunk k's host tails — running the leg
        # inline on the submitting thread (as this path did before r5)
        # serialized every chunk's wire sync behind the previous one's and
        # cost the DP path ~1.9x the threaded batch() schedule (BENCH_r04:
        # 316 vs 168 ms/page).  Host tails (contours, rec dispatch+sync,
        # tokenize, aggregation) pipeline per page in a second pool, with
        # a bounded in-flight window so at most ~2 chunks' device buffers
        # stay alive.
        results = [None] * len(imgs)
        from collections import deque

        dev_depth = max(
            1, int(os.environ.get("YOMITOKU_TPU_DP_DEVICE_DEPTH", "4"))
        )
        tail_window = 2 * chunk_pages
        tail_workers = int(
            os.environ.get("YOMITOKU_TPU_DP_TAIL_WORKERS", "0")
        ) or max(4, chunk_pages)
        with ThreadPoolExecutor(max_workers=dev_depth) as dev_ex, \
                ThreadPoolExecutor(max_workers=tail_workers) as tail_ex:
            leg_futs = deque(
                (ids, dev_ex.submit(_device_leg, ids, det_hw))
                for ids, det_hw in chunks[:dev_depth]
            )
            next_chunk = dev_depth
            tails = deque()
            while leg_futs:
                ids, fut = leg_futs.popleft()
                pages_dev, per_page = fut.result()
                if next_chunk < len(chunks):
                    c_ids, c_hw = chunks[next_chunk]
                    leg_futs.append(
                        (c_ids, dev_ex.submit(_device_leg, c_ids, c_hw))
                    )
                    next_chunk += 1
                for j, i in enumerate(ids):
                    page_view = SimpleNamespace(
                        dev=pages_dev[j], hw=tuple(imgs[i].shape[:2])
                    )
                    tails.append(
                        (i, tail_ex.submit(_post_one, i, page_view,
                                           per_page[j]))
                    )
                while len(tails) > tail_window:
                    i, tfut = tails.popleft()
                    results[i] = tfut.result()
            while tails:
                i, tfut = tails.popleft()
                results[i] = tfut.result()
        return results

    def _batch_dp_host(self, imgs):
        """Stage-batched, page-parallel analysis over the dp mesh with
        HOST preprocessing (the CPU-backend fallback of _batch_dp).

        Each stage runs ONE forward over the concatenation of every
        page's inputs (pages / layout tiles / table crops / line crops);
        ``JaxModel.place_batch`` shards the leading axis across the
        mesh's dp chips whenever it divides evenly.  Host postprocessing
        stays per-page.  Visualization is not supported on this path
        (``batch`` falls back to the threaded pipeline)."""
        from collections import defaultdict

        from .data.dataset import ParseqDataset
        from .schemas import (
            LayoutAnalyzerSchema,
            LayoutParserSchema,
            TextDetectorSchema,
            TextRecognizerSchema,
        )

        det, rec = self.text_detector, self.text_recognizer
        lp = self.layout.layout_parser
        tsr = self.layout.table_structure_recognizer
        n = len(imgs)

        # --- detector: same-bucket pages stack into one sharded forward
        buckets = defaultdict(list)
        for i, img in enumerate(imgs):
            tensor = det.preprocess_u8(img)  # (1, oh, ow, 3) uint8
            buckets[tensor.shape[1:3]].append((i, tensor[0]))
        det_results = [None] * n
        for members in buckets.values():
            maps = det.model.forward_binary_u8(
                np.stack([t for _, t in members]), as_u8=True
            )
            for (i, _), prob in zip(members, maps):
                quads, scores = det.postprocess(
                    {"binary": prob[None]}, imgs[i].shape[:2]
                )
                det_results[i] = TextDetectorSchema(points=quads, scores=scores)

        # --- layout: every page's tile in one sharded forward
        tiles = np.concatenate([lp.preprocess(img) for img in imgs])
        preds = lp.model.forward(tiles)
        sizes = [[img.shape[1], img.shape[0]] for img in imgs]
        per_page = lp.postprocessor(preds, sizes, lp.thresh_score)
        layout_results = [
            LayoutParserSchema(**lp.filtering_elements(one))
            for one in per_page
        ]

        # --- TSR: every table crop of every page in one sharded forward
        tsr_data, owners = [], []
        for i, lres in enumerate(layout_results):
            data = tsr.preprocess(imgs[i], [t.box for t in lres.tables])
            tsr_data.extend(data)
            owners.extend([i] * len(data))
        page_tables = [[] for _ in range(n)]
        if tsr_data:
            preds = tsr.model.forward(
                np.stack([d["array"] for d in tsr_data])
            )
            sizes = [[d["size"][1], d["size"][0]] for d in tsr_data]
            filtered = tsr.postprocessor(preds, sizes, tsr.thresh_score)
            for owner, d, one in zip(owners, tsr_data, filtered):
                table = tsr.postprocess(one, d)
                if table.n_row > 0 and table.n_col > 0:
                    page_tables[owner].append(table)
        layouts = [
            LayoutAnalyzerSchema(
                paragraphs=lres.paragraphs,
                tables=page_tables[i],
                figures=lres.figures,
            )
            for i, lres in enumerate(layout_results)
        ]

        if self.split_text_across_cells:
            for i in range(n):
                det_results[i] = _split_text_across_cells(
                    det_results[i], layouts[i]
                )

        # --- recognizer: every page's line crops in one bucketed stream
        datasets = [
            ParseqDataset(rec._cfg, imgs[i], det_results[i].points)
            for i in range(n)
        ]
        crops = [ds.as_u8_array() for ds in datasets]
        all_points = [q for ds in datasets for q in ds.valid_quads]
        nonempty = [c for c in crops if len(c)]
        preds = scores = directions = []
        if nonempty:
            preds, scores, directions = rec._run_batch_inference(
                np.concatenate(nonempty), all_points
            )

        results, offset = [], 0
        for i, ds in enumerate(datasets):
            c = len(crops[i])
            p = list(preds[offset : offset + c])
            s = list(scores[offset : offset + c])
            d = list(directions[offset : offset + c])
            offset += c
            if rec.rec_orientation_fallback and c:
                rec._apply_orientation_fallback(ds, ds.valid_quads, p, s, d)
            rec_res = TextRecognizerSchema(
                contents=p, scores=s, points=ds.valid_quads, directions=d
            )
            ocr = OCRSchema(words=ocr_aggregate(det_results[i], rec_res))
            outputs = self.aggregate(ocr, layouts[i])
            results.append((DocumentAnalyzerSchema(**outputs), None, None))
        return results
