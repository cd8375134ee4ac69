"""DocumentAnalyzer: the full-page pipeline.

Reference parity: yomitoku/document_analyzer.py — detector ∥ layout
analysis, optional split of detected quads at table-cell boundaries,
recognition, aggregation (words -> cells/paragraphs by 0.5-containment,
ruby filtering, figures absorbing contained paragraphs, reading order with
header/body/footer offsets).

TPU adaptation: detector and layout run concurrently in a 2-worker thread
pool like the reference; each is its own jitted XLA program so the host
threads just drive dispatch.
"""

import asyncio
import math
import re
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .layout_analyzer import LayoutAnalyzer
from .ocr import OCRSchema, ocr_aggregate
from .reading_order import prediction_reading_order
from .schemas import DocumentAnalyzerSchema, FigureSchema, ParagraphSchema
from .text_detector import TextDetector
from .text_recognizer import TextRecognizer
from .utils.misc import calc_overlap_ratio, is_contained, quad_to_xyxy


def combine_flags(flag1, flag2):
    return [f1 or f2 for f1, f2 in zip(flag1, flag2)]


def judge_page_direction(paragraphs):
    """Direction with the larger total paragraph area wins
    (reference document_analyzer.py:23)."""
    h_sum_area = 0
    v_sum_area = 0
    for paragraph in paragraphs:
        x1, y1, x2, y2 = paragraph.box
        area = (x2 - x1) * (y2 - y1)
        if paragraph.direction == "horizontal":
            h_sum_area += area
        else:
            v_sum_area += area
    return "vertical" if v_sum_area > h_sum_area else "horizontal"


def extract_paragraph_within_figure(paragraphs, figures):
    """Figures absorb paragraphs 0.7-contained in them, ordered internally
    (reference document_analyzer.py:43)."""
    new_figures = []
    check_list = [False] * len(paragraphs)
    for figure in figures:
        fig = {"box": figure.box, "order": 0}
        contained = []
        for i, paragraph in enumerate(paragraphs):
            if is_contained(fig["box"], paragraph.box, threshold=0.7):
                contained.append(paragraph)
                check_list[i] = True
        fig["direction"] = judge_page_direction(contained)
        order = "left2right" if fig["direction"] == "horizontal" else "right2left"
        fig_paragraphs = prediction_reading_order(contained, order)
        fig["paragraphs"] = sorted(fig_paragraphs, key=lambda x: x.order)
        new_figures.append(FigureSchema(**fig))
    return new_figures, check_list


_RE_HIRAGANA_ONLY = re.compile(r"^[぀-ゟ]+$")
_RE_KATAKANA_ONLY = re.compile(r"^[゠-ヿ]+$")


def _mad_threshold(sizes):
    """Median-absolute-deviation fallback threshold
    (reference document_analyzer.py:75)."""
    sorted_sizes = sorted(sizes)
    n = len(sorted_sizes)
    median_s = sorted_sizes[n // 2]
    if median_s == 0:
        return None
    deviations = sorted(abs(s - median_s) for s in sizes)
    mad = deviations[n // 2]
    if mad == 0:
        return None
    threshold = median_s - 2 * mad
    return threshold if threshold > 0 else None


def _compute_ruby_threshold(sizes, k):
    """Log-size histogram valley split when bimodality is strong
    (sep >= k), else MAD fallback (reference document_analyzer.py:95)."""
    n = len(sizes)
    if n < 3:
        return None
    log_sizes = [math.log(s) for s in sizes]
    num_bins = max(8, int(math.sqrt(n)))
    min_val, max_val = min(log_sizes), max(log_sizes)
    if max_val - min_val < 1e-9:
        return None
    bin_width = (max_val - min_val) / num_bins
    hist = [0] * num_bins
    for v in log_sizes:
        idx = min(int((v - min_val) / bin_width), num_bins - 1)
        hist[idx] += 1

    p1 = max(range(num_bins), key=lambda i: hist[i])
    p2, p2_val = None, -1
    for i in range(num_bins):
        if abs(i - p1) >= 2 and hist[i] > p2_val:
            p2, p2_val = i, hist[i]
    if p2 is None:
        return _mad_threshold(sizes)
    lo, hi = min(p1, p2), max(p1, p2)
    if hi - lo <= 1:
        return _mad_threshold(sizes)
    valley_range = range(lo + 1, hi)
    valley_val = min(hist[i] for i in valley_range)
    valley_bins = [i for i in valley_range if hist[i] == valley_val]
    valley = valley_bins[len(valley_bins) // 2]
    sep = (hist[p1] + hist[p2]) / (2 * valley_val + 1e-6)
    if sep >= k:
        return math.exp(min_val + (valley + 0.5) * bin_width)
    return _mad_threshold(sizes)


def filter_ruby(contained_words, element_direction, ruby_threshold):
    """Drop small hiragana/katakana-only words below the size split
    (furigana; reference document_analyzer.py:155)."""
    if len(contained_words) <= 1:
        return contained_words
    sizes = []
    for word in contained_words:
        x1, y1, x2, y2 = word.box
        sizes.append(math.sqrt((x2 - x1) * (y2 - y1)))
    valid_sizes = [s for s in sizes if s > 0]
    if len(valid_sizes) < 2:
        return contained_words
    threshold = _compute_ruby_threshold(valid_sizes, ruby_threshold)
    if threshold is None:
        return contained_words
    filtered = []
    for word, s in zip(contained_words, sizes):
        if s > 0 and s < threshold:
            text = word.contents.replace(" ", "")
            if _RE_HIRAGANA_ONLY.match(text) or _RE_KATAKANA_ONLY.match(text):
                continue
        filtered.append(word)
    return filtered


def extract_words_within_element(
    pred_words, element, ignore_ruby=False, ruby_threshold=2.0,
    word_boxes=None,
):
    """Assign words 0.5-contained in the element, vote direction, order
    them, and join to a text block (reference document_analyzer.py:195).

    ``word_boxes``: optional precomputed ``quad_to_xyxy`` boxes for
    ``pred_words`` — callers looping over many elements should compute
    them once (aggregate() does)."""
    contained_words = []
    check_list = [False] * len(pred_words)
    if pred_words:
        from .utils.misc import containment_matrix

        if word_boxes is None:
            word_boxes = [quad_to_xyxy(w.points) for w in pred_words]
        inside = containment_matrix([element.box], word_boxes, threshold=0.5)[0]
        for i, word in enumerate(pred_words):
            if inside[i]:
                check_list[i] = True
                contained_words.append(
                    ParagraphSchema(
                        box=word_boxes[i],
                        contents=word.content,
                        direction=word.direction,
                        order=0,
                        role=None,
                    )
                )
    if len(contained_words) == 0:
        return None, None, check_list

    word_direction = [word.direction for word in contained_words]
    cnt_horizontal = word_direction.count("horizontal")
    cnt_vertical = word_direction.count("vertical")
    element_direction = (
        "horizontal" if cnt_horizontal > cnt_vertical else "vertical"
    )

    if ignore_ruby:
        contained_words = filter_ruby(
            contained_words, element_direction, ruby_threshold
        )
        if len(contained_words) == 0:
            return None, None, check_list

    order = "left2right" if element_direction == "horizontal" else "right2left"
    prediction_reading_order(contained_words, order)
    contained_words = sorted(contained_words, key=lambda x: x.order)
    text = "\n".join(w.contents for w in contained_words)
    return text, element_direction, check_list


def is_vertical(quad, thresh_aspect=2):
    quad = np.array(quad)
    width = np.linalg.norm(quad[0] - quad[1])
    height = np.linalg.norm(quad[1] - quad[2])
    return height > width * thresh_aspect


def is_noise(quad, thresh=15):
    quad = np.array(quad)
    width = np.linalg.norm(quad[0] - quad[1])
    height = np.linalg.norm(quad[1] - quad[2])
    return width < thresh or height < thresh


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


def _extract_words_within_table(words, table, check_list):
    horizontal_words = []
    vertical_words = []
    for i, (points, score) in enumerate(zip(words.points, words.scores)):
        word_box = quad_to_xyxy(points)
        if is_contained(table.box, word_box, threshold=0.5):
            if is_vertical(points):
                vertical_words.append({"points": points, "score": score})
            else:
                horizontal_words.append({"points": points, "score": score})
            check_list[i] = True
    return horizontal_words, vertical_words, check_list


def _calc_overlap_words_on_lines(lines, words):
    overlap_ratios = [[0 for _ in lines] for _ in words]
    for i, word in enumerate(words):
        word_box = quad_to_xyxy(word["points"])
        for j, row in enumerate(lines):
            overlap_ratio, _ = calc_overlap_ratio(row.box, word_box)
            overlap_ratios[i][j] = overlap_ratio
    return overlap_ratios


def _correct_vertical_word_boxes(overlap_ratios_vertical, table, table_words_vertical):
    allocated_cols = [cols.index(max(cols)) for cols in overlap_ratios_vertical]
    new_points, new_scores = [], []
    for i, col_index in enumerate(allocated_cols):
        col_cells = [
            cell
            for cell in table.cells
            if cell.col <= (col_index + 1) < (cell.col + cell.col_span)
        ]
        word_point = table_words_vertical[i]["points"]
        word_score = table_words_vertical[i]["score"]
        for cell in col_cells:
            word_box = quad_to_xyxy(word_point)
            _, intersection = calc_overlap_ratio(cell.box, word_box)
            if intersection is not None:
                _, y1, _, y2 = intersection
                new_point = [
                    [word_point[0][0], max(word_point[0][1], y1)],
                    [word_point[1][0], max(word_point[1][1], y1)],
                    [word_point[2][0], min(word_point[2][1], y2)],
                    [word_point[3][0], min(word_point[3][1], y2)],
                ]
                if not is_noise(new_point):
                    new_points.append(new_point)
                    new_scores.append(word_score)
    return new_points, new_scores


def _correct_horizontal_word_boxes(
    overlap_ratios_horizontal, table, table_words_horizontal
):
    allocated_rows = [rows.index(max(rows)) for rows in overlap_ratios_horizontal]
    new_points, new_scores = [], []
    for i, row_index in enumerate(allocated_rows):
        row_cells = [
            cell
            for cell in table.cells
            if cell.row <= (row_index + 1) < (cell.row + cell.row_span)
        ]
        word_point = table_words_horizontal[i]["points"]
        word_score = table_words_horizontal[i]["score"]
        for cell in row_cells:
            word_box = quad_to_xyxy(word_point)
            _, intersection = calc_overlap_ratio(cell.box, word_box)
            if intersection is not None:
                x1, _, x2, _ = intersection
                new_point = [
                    [max(word_point[0][0], x1), word_point[0][1]],
                    [min(word_point[1][0], x2), word_point[1][1]],
                    [min(word_point[2][0], x2), word_point[2][1]],
                    [max(word_point[3][0], x1), word_point[3][1]],
                ]
                if not is_noise(new_point):
                    new_points.append(new_point)
                    new_scores.append(word_score)
    return new_points, new_scores


def _split_text_across_cells(results_det, results_layout):
    """Split detected quads at table row/col boundaries
    (reference document_analyzer.py:383)."""
    check_list = [False] * len(results_det.points)
    new_points, new_scores = [], []
    for table in results_layout.tables:
        words_h, words_v, check_list = _extract_words_within_table(
            results_det, table, check_list
        )
        ratios_h = _calc_overlap_words_on_lines(table.rows, words_h)
        ratios_v = _calc_overlap_words_on_lines(table.cols, words_v)
        pts_h, sc_h = _correct_horizontal_word_boxes(ratios_h, table, words_h)
        pts_v, sc_v = _correct_vertical_word_boxes(ratios_v, table, words_v)
        new_points.extend(pts_h + pts_v)
        new_scores.extend(sc_h + sc_v)

    for i, flag in enumerate(check_list):
        if not flag:
            new_points.append(results_det.points[i])
            new_scores.append(results_det.scores[i])

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
        self.ignore_meta = ignore_meta
        self.split_text_across_cells = split_text_across_cells
        self.ignore_ruby = ignore_ruby
        self.ruby_threshold = ruby_threshold
        self.img = None

    def aggregate(self, ocr_res, layout_res):
        paragraphs = []
        check_list = [False] * len(ocr_res.words)
        word_boxes = [quad_to_xyxy(w.points) for w in ocr_res.words]
        for table in layout_res.tables:
            for cell in table.cells:
                words, _, flags = extract_words_within_element(
                    ocr_res.words,
                    cell,
                    ignore_ruby=self.ignore_ruby,
                    ruby_threshold=self.ruby_threshold,
                    word_boxes=word_boxes,
                )
                cell.contents = words if words is not None else ""
                check_list = combine_flags(check_list, flags)

        for paragraph in layout_res.paragraphs:
            words, direction, flags = extract_words_within_element(
                ocr_res.words,
                paragraph,
                ignore_ruby=self.ignore_ruby,
                ruby_threshold=self.ruby_threshold,
                word_boxes=word_boxes,
            )
            if words is None:
                continue
            check_list = combine_flags(check_list, flags)
            paragraphs.append(
                ParagraphSchema(
                    contents=words,
                    box=paragraph.box,
                    direction=direction,
                    order=0,
                    role=paragraph.role,
                )
            )

        for i, word in enumerate(ocr_res.words):
            if not check_list[i]:
                paragraphs.append(
                    ParagraphSchema(
                        contents=word.content,
                        box=quad_to_xyxy(word.points),
                        direction=word.direction,
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

    async def run(self, img):
        from .ops.device_crop import DevicePage, device_crops_enabled

        # one uint8 page upload shared by detector, layout, TSR, and
        # recognizer programs (each otherwise uploads its own resize/crops)
        page = DevicePage(img) if device_crops_enabled() else None
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
            results_ocr = OCRSchema(words=ocr_aggregate(results_det, results_rec))
            outputs = self.aggregate(results_ocr, results_layout)

        return DocumentAnalyzerSchema(**outputs), ocr, layout

    def __call__(self, img):
        self.img = img
        results, ocr, layout = asyncio.run(self.run(img))
        if self.visualize:
            from .utils.visualizer import reading_order_visualizer

            layout = reading_order_visualizer(layout, results)
        return results, ocr, layout

    def batch(self, imgs, max_in_flight=3):
        """Pipelined multi-page analysis: up to ``max_in_flight`` pages
        run concurrently so one page's host stages (contours, crops,
        tokenizer, aggregation) overlap another page's device programs
        and transfers.  The jitted programs are shared (same compiled
        executables); XLA queues their dispatches FIFO.  Depth 3
        measured ~15 percent faster than 2 on the transfer-bound tunnel
        (three-way overlap: upload / device / readback+host); deeper
        pipelines regress (queue contention).

        Returns the list of (DocumentAnalyzerSchema, ocr_vis, layout_vis)
        in input order.  No multi-device requirement — this hides
        host<->device latency even on a single chip; combine with
        ``num_devices`` to also shard the batches.
        """
        if not imgs:
            return []

        def _one(img):
            results, ocr, layout = asyncio.run(self.run(img))
            if self.visualize:
                from .utils.visualizer import reading_order_visualizer

                layout = reading_order_visualizer(layout, results)
            return results, ocr, layout

        with ThreadPoolExecutor(max_workers=max_in_flight) as executor:
            return list(executor.map(_one, imgs))
