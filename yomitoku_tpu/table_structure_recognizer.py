"""TableStructureRecognizer task module (RT-DETRv2, classes {row, col,
span}).

Reference parity: yomitoku/table_structure_recognizer.py — per table box:
crop, resize 640x640, detect rows/cols/spans, cells = row x col
intersections, merge cells under span boxes, offset back to page coords.

TPU adaptation: the reference runs one batch-1 forward per table
(table_structure_recognizer.py:258+); here all table crops go through ONE
batched jitted forward.
"""

import cv2
import numpy as np

from .base import BaseModelCatalog, BaseModule
from .configs import TableStructureRecognizerRTDETRv2Config
from .layout_parser import (
    filter_contained_rectangles_within_category,
    preprocess_rtdetr,
)
from .models.rtdetr import RTDETRv2
from .postprocessor.rtdetr_postprocessor import RTDETRPostProcessor
from .schemas import TableStructureRecognizerSchema
from .utils.misc import calc_intersection, filter_by_flag, is_contained


class TableStructureRecognizerModelCatalog(BaseModelCatalog):
    def __init__(self):
        super().__init__()
        self.register("rtdetrv2", TableStructureRecognizerRTDETRv2Config, RTDETRv2)


def extract_cells(row_boxes, col_boxes):
    """Cells are the row x col box intersections
    (reference table_structure_recognizer.py:27)."""
    cells = []
    for i, row_box in enumerate(row_boxes):
        for j, col_box in enumerate(col_boxes):
            intersection = calc_intersection(row_box, col_box)
            if intersection is None:
                continue
            cells.append(
                {
                    "col": j + 1,
                    "row": i + 1,
                    "col_span": 1,
                    "row_span": 1,
                    "box": intersection,
                    "contents": None,
                }
            )
    return cells


def filter_contained_cells_within_spancell(cells, span_boxes):
    """Merge cells contained in a span box into one row/col-span cell
    (reference table_structure_recognizer.py:49)."""
    check_list = [True] * len(cells)
    child_boxes = [[] for _ in span_boxes]
    for i, span_box in enumerate(span_boxes):
        for j, sub_cell in enumerate(cells):
            if is_contained(span_box, sub_cell["box"]):
                check_list[j] = False
                child_boxes[i].append(sub_cell)
    cells = filter_by_flag(cells, check_list)
    for i, span_box in enumerate(span_boxes):
        child = child_boxes[i]
        if not child:
            continue
        row = min(c["row"] for c in child)
        col = min(c["col"] for c in child)
        cells.append(
            {
                "col": col,
                "row": row,
                "col_span": max(c["col"] for c in child) - col + 1,
                "row_span": max(c["row"] for c in child) - row + 1,
                "box": list(map(int, span_box)),
                "contents": None,
            }
        )
    return sorted(cells, key=lambda x: (x["row"], x["col"]))


class TableStructureRecognizer(BaseModule):
    model_catalog = TableStructureRecognizerModelCatalog()

    def __init__(
        self,
        model_name="rtdetrv2",
        path_cfg=None,
        device="tpu",
        visualize=False,
        from_pretrained=True,
        infer_onnx=False,  # API compat
        num_devices=None,
    ):
        super().__init__()
        self.load_model(model_name, path_cfg, from_pretrained=from_pretrained)
        if num_devices is not None:
            from .parallel import dp_mesh

            mesh = dp_mesh(num_devices)
            if mesh is not None:
                self.model.use_mesh(mesh)
        self.device = device
        self.visualize = visualize
        self.model.trace_stage = "tsr"
        self.postprocessor = RTDETRPostProcessor(
            num_classes=self._cfg.RTDETRTransformerv2.num_classes,
            num_top_queries=self._cfg.RTDETRTransformerv2.num_queries,
        )
        self.postprocessor.trace_stage = "tsr"
        self.thresh_score = self._cfg.thresh_score
        self.label_mapper = dict(enumerate(self._cfg.category))

    def preprocess(self, img, boxes):
        cv_img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        table_imgs = []
        for box in boxes:
            x1, y1, x2, y2 = map(int, box)
            crop = cv_img[y1:y2, x1:x2, :]
            th, tw = crop.shape[:2]
            resized = cv2.resize(
                crop,
                (self._cfg.data.img_size[1], self._cfg.data.img_size[0]),
                interpolation=cv2.INTER_AREA,
            )
            table_imgs.append(
                {
                    "array": resized,  # uint8; scaled on device
                    "size": (th, tw),
                    "offset": (x1, y1),
                }
            )
        return table_imgs

    def postprocess(self, preds, data):
        """``preds``: one already-filtered {labels, boxes, scores} dict."""
        category_elements = {c: [] for c in self.label_mapper.values()}
        for box, score, label in zip(
            preds["boxes"], preds["scores"], preds["labels"]
        ):
            box = box.astype(int).tolist()
            box[0] += data["offset"][0]
            box[1] += data["offset"][1]
            box[2] += data["offset"][0]
            box[3] += data["offset"][1]
            category_elements[self.label_mapper[int(label)]].append(
                {"box": box, "score": float(score)}
            )
        category_elements = filter_contained_rectangles_within_category(
            category_elements
        )
        cells, rows, cols, spans = self.extract_cell_elements(category_elements)

        table_x, table_y = data["offset"]
        table = {
            "box": [
                table_x,
                table_y,
                table_x + data["size"][1],
                table_y + data["size"][0],
            ],
            "n_row": len(rows),
            "n_col": len(cols),
            "rows": rows,
            "cols": cols,
            "spans": spans,
            "cells": cells,
            "order": 0,
        }
        return TableStructureRecognizerSchema(**table)

    def extract_cell_elements(self, elements):
        row_boxes = sorted((e["box"] for e in elements["row"]), key=lambda x: x[1])
        col_boxes = sorted((e["box"] for e in elements["col"]), key=lambda x: x[0])
        span_boxes = [e["box"] for e in elements["span"]]

        cells = extract_cells(row_boxes, col_boxes)
        cells = filter_contained_cells_within_spancell(cells, span_boxes)

        rows = sorted(elements["row"], key=lambda x: x["box"][1])
        cols = sorted(elements["col"], key=lambda x: x["box"][0])
        spans = sorted(elements["span"], key=lambda x: x["box"][1])
        return cells, rows, cols, spans

    def _preprocess_meta(self, img, boxes):
        """Page-path preprocess: sizes/offsets only — the crop+resize runs
        on device (no host cv2 work, no crop upload)."""
        h, w = img.shape[:2]
        out = []
        for box in boxes:
            x1, y1, x2, y2 = map(int, box)
            # mirror the host path's implicit clamp (array slicing)
            x1, y1 = max(0, x1), max(0, y1)
            x2, y2 = min(w, x2), min(h, y2)
            out.append({"size": (y2 - y1, x2 - x1), "offset": (x1, y1)})
        return out

    def tables_from_filtered(self, data, filtered):
        """Per-region filtered detections -> TableStructureRecognizerSchema
        list (tables with no rows or no cols dropped)."""
        outputs = []
        for d, one in zip(data, filtered):
            table = self.postprocess(one, d)
            if table.n_row > 0 and table.n_col > 0:
                outputs.append(table)
        return outputs

    def __call__(self, img, table_boxes, vis=None, page=None):
        data = (
            self._preprocess_meta(img, table_boxes)
            if page is not None
            else self.preprocess(img, table_boxes)
        )
        outputs = []
        if data:
            # one batched forward over all tables on the page, one fused
            # device->host readback for every table's filtered detections
            if page is not None:
                from .ops.device_crop import filtered_regions_from_page

                filtered = filtered_regions_from_page(
                    self.model, page, data,
                    tuple(self._cfg.data.img_size),
                    self.postprocessor, self.thresh_score,
                )
            else:
                batch = np.stack([d["array"] for d in data])
                preds = self.model.forward(batch)
                sizes = [[d["size"][1], d["size"][0]] for d in data]
                filtered = self.postprocessor(preds, sizes, self.thresh_score)
            outputs = self.tables_from_filtered(data, filtered)

        if vis is None and self.visualize:
            vis = img.copy()
        if self.visualize:
            from .utils.visualizer import table_visualizer

            for table in outputs:
                vis = table_visualizer(vis, table)
        return outputs, vis
