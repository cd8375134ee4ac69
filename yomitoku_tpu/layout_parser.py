"""LayoutParser task module (RT-DETRv2).

Reference parity: yomitoku/layout_parser.py — 640x640 RGB [0,1] input (no
mean/std normalization), RT-DETR forward, top-k postprocess, containment
dedup within category (keep larger), drop paragraphs contained in tables,
roles folded into paragraphs.
"""

import cv2
import numpy as np

from .base import BaseModelCatalog, BaseModule
from .configs import LayoutParserRTDETRv2Config, LayoutParserRTDETRv2V2Config
from .models.rtdetr import RTDETRv2
from .postprocessor.rtdetr_postprocessor import RTDETRPostProcessor
from .schemas import LayoutParserSchema
from .utils.misc import containment_matrix, filter_by_flag, is_contained


class LayoutParserModelCatalog(BaseModelCatalog):
    def __init__(self):
        super().__init__()
        self.register("rtdetrv2", LayoutParserRTDETRv2Config, RTDETRv2)
        self.register("rtdetrv2v2", LayoutParserRTDETRv2V2Config, RTDETRv2)


def filter_contained_rectangles_within_category(category_elements):
    """Drop rectangles contained in another of the same category; mutual
    containment keeps the larger (reference layout_parser.py:28)."""
    for category, elements in category_elements.items():
        boxes = [element["box"] for element in elements]
        n = len(boxes)
        if n <= 1:
            continue
        # vectorized: inside[i, j] == is_contained(box_i, box_j)
        inside = containment_matrix(boxes, boxes)
        b = np.asarray(boxes, np.float64)
        area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        upper = np.triu(np.ones((n, n), bool), 1)
        both = inside & inside.T
        ij_only = inside & ~inside.T   # j inside i -> drop j (keep outer)
        ji_only = inside.T & ~inside   # i inside j -> drop i
        a_gt = area[:, None] > area[None, :]
        drop_j = upper & ((both & a_gt) | ij_only)
        drop_i = upper & ((both & ~a_gt) | ji_only)
        dropped = drop_i.any(axis=1) | drop_j.any(axis=0)
        category_elements[category] = filter_by_flag(
            elements, (~dropped).tolist()
        )
    return category_elements


def filter_contained_rectangles_across_categories(category_elements, source, target):
    """Drop target-category rectangles contained in source-category ones
    (reference layout_parser.py:61)."""
    src_boxes = [element["box"] for element in category_elements[source]]
    tgt_boxes = [element["box"] for element in category_elements[target]]
    if src_boxes and tgt_boxes:
        dropped = containment_matrix(src_boxes, tgt_boxes).any(axis=0)
        check_list = (~dropped).tolist()
    else:
        check_list = [True] * len(tgt_boxes)
    category_elements[target] = filter_by_flag(category_elements[target], check_list)
    return category_elements


def preprocess_rtdetr(img_bgr, img_size):
    """BGR uint8 -> (1, H, W, 3) uint8 RGB at img_size.

    The reference resizes with PIL bilinear+antialias (T.Resize on a PIL
    image); cv2 INTER_AREA is the closest equivalent for the downscale
    case that dominates here."""
    rgb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    resized = cv2.resize(
        rgb, (img_size[1], img_size[0]), interpolation=cv2.INTER_AREA
    )
    # uint8 out; the [0,1] scaling is fused into the device program
    # (models/rtdetr.py _forward), cutting host->device bytes 4x.
    return resized[None]


class LayoutParser(BaseModule):
    model_catalog = LayoutParserModelCatalog()

    def __init__(
        self,
        model_name="rtdetrv2v2",
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
        self.model.trace_stage = "layout"
        self.postprocessor = RTDETRPostProcessor(
            num_classes=self._cfg.RTDETRTransformerv2.num_classes,
            num_top_queries=self._cfg.RTDETRTransformerv2.num_queries,
        )
        self.postprocessor.trace_stage = "layout"
        self.thresh_score = self._cfg.thresh_score
        self.label_mapper = dict(enumerate(self._cfg.category))
        self.role = self._cfg.role

    def preprocess(self, img):
        return preprocess_rtdetr(img, self._cfg.data.img_size)

    def postprocess(self, preds, image_size):
        h, w = image_size
        outputs = self.postprocessor(preds, [[w, h]], self.thresh_score)
        outputs = self.filtering_elements(outputs[0])
        return LayoutParserSchema(**outputs)

    def filtering_elements(self, preds):
        category_elements = {
            category: []
            for category in self.label_mapper.values()
            if category not in self.role
        }
        for box, score, label in zip(
            preds["boxes"], preds["scores"], preds["labels"]
        ):
            category = self.label_mapper[int(label)]
            role = None
            if category in self.role:
                role = category
                category = "paragraphs"
            category_elements[category].append(
                {
                    "id": None,
                    "box": box.astype(int).tolist(),
                    "score": float(score),
                    "role": role,
                    "contents": None,
                }
            )
        category_elements = filter_contained_rectangles_within_category(
            category_elements
        )
        category_elements = filter_contained_rectangles_across_categories(
            category_elements, "tables", "paragraphs"
        )
        return category_elements

    def __call__(self, img, page=None):
        ori_h, ori_w = img.shape[:2]
        if page is not None:
            from .ops.device_crop import staged_page_mat

            mats = staged_page_mat(
                (ori_h, ori_w), tuple(self._cfg.data.img_size)
            )
            preds = self.model.forward_from_page(
                page.dev, mats, tuple(self._cfg.data.img_size)
            )
        else:
            tensor = self.preprocess(img)
            preds = self.model.forward(tensor)
        results = self.postprocess(preds, (ori_h, ori_w))

        vis = None
        if self.visualize:
            from .utils.visualizer import layout_visualizer

            vis = layout_visualizer(results, img)
        return results, vis
