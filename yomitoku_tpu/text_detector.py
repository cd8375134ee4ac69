"""TextDetector task module (DBNet).

Reference parity: yomitoku/text_detector.py — catalog of DBNet variants,
shortest-edge-1280/limit-1600 resize with /32 snapping, ImageNet
standardization, model forward, contour/unclip postprocess to word quads.

TPU adaptations: the model is one jitted NHWC program; variable page
geometry is bucketed (both dims /32-snapped already) so XLA compiles a
bounded set of programs.  The (H, W) probability map returns to the host
for cv2 contour extraction (see postprocessor/dbnet_postprocessor.py for
the pyclipper-free unclip).
"""

import numpy as np

from .base import BaseModelCatalog, BaseModule
from .configs import (
    TextDetectorDBNetConfig,
    TextDetectorDBNetV2_1Config,
    TextDetectorDBNetV2_1LiteConfig,
    TextDetectorDBNetV2Config,
)
from .data.functions import (
    array_to_nhwc,
    resize_shortest_edge,
    standardization_image,
)
from .models.dbnet import DBNet
from .postprocessor.dbnet_postprocessor import DBnetPostProcessor
from .schemas import TextDetectorSchema


class TextDetectorModelCatalog(BaseModelCatalog):
    def __init__(self):
        super().__init__()
        self.register("dbnet", TextDetectorDBNetConfig, DBNet)
        self.register("dbnetv2", TextDetectorDBNetV2Config, DBNet)
        self.register("dbnetv2_1", TextDetectorDBNetV2_1Config, DBNet)
        # same v2_1 weights at reduced input resolution (CPU --lite mode)
        self.register("dbnetv2_1-lite", TextDetectorDBNetV2_1LiteConfig, DBNet)


class TextDetector(BaseModule):
    model_catalog = TextDetectorModelCatalog()

    def __init__(
        self,
        model_name="dbnetv2_1",
        path_cfg=None,
        device="tpu",
        visualize=False,
        from_pretrained=True,
        infer_onnx=False,  # API compat; ONNX path replaced by JAX
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
        self.post_processor = DBnetPostProcessor(**self._cfg.post_process)

    def preprocess(self, img):
        # The reference flips BGR->RGB in preprocess AND standardization
        # flips again (text_detector.py:99-107 + data/functions.py:241), so
        # the checkpoint actually expects BGR channel order under RGB-mean
        # normalization.  Reproduce exactly.
        img = img[:, :, ::-1].astype(np.float32)
        resized = resize_shortest_edge(
            img, self._cfg.data.shortest_size, self._cfg.data.limit_size
        )
        normalized = standardization_image(resized)
        return array_to_nhwc(normalized)

    def preprocess_u8(self, img):
        """Throughput path: resize the uint8 page on host, leave the float
        standardization to the device program (DBNet._forward_u8).  The
        two BGR<->RGB flips of the parity path cancel, so no flip here.

        Known deviation from ``preprocess``: the reference resizes AFTER
        the float32 conversion, so interpolated pixels keep fractions;
        resizing uint8 rounds them (<=0.5/255 per pixel, measured 0.0045
        max deviation on the prob map against a 0.3 binarization
        threshold).  Use ``preprocess`` + ``forward_binary`` for
        bit-faithful comparisons."""
        resized = resize_shortest_edge(
            img, self._cfg.data.shortest_size, self._cfg.data.limit_size
        )
        return resized[None, ...]

    def postprocess(self, preds, image_size):
        return self.post_processor(preds, image_size)

    def __call__(self, img, page=None):
        """Detect text quads in a BGR image.  When ``page`` (a shared
        ops.device_crop.DevicePage) is given, the resize + normalization
        run on device from the already-uploaded page buffer."""
        ori_h, ori_w = img.shape[:2]
        if page is not None:
            from .data.functions import shortest_edge_size

            out_hw = shortest_edge_size(
                ori_h, ori_w,
                self._cfg.data.shortest_size, self._cfg.data.limit_size,
            )
            binary = self.model.forward_binary_from_page(
                page.dev, page.hw, out_hw, as_u8=True
            )
        else:
            tensor = self.preprocess_u8(img)
            # u8 wire map (1, H, W): postprocessor and visualizer consume
            # it directly, skipping the 1+ MB float conversion
            binary = self.model.forward_binary_u8(tensor, as_u8=True)
        preds = {"binary": binary}
        from .utils.stagetrace import segment

        with segment("det", "contours"):
            quads, scores = self.postprocess(preds, (ori_h, ori_w))
        results = TextDetectorSchema(points=quads, scores=scores)

        vis = None
        if self.visualize:
            from .utils.visualizer import det_visualizer

            vis = det_visualizer(
                img,
                quads,
                preds=binary[0],
                vis_heatmap=self._cfg.visualize.heatmap,
                line_color=tuple(self._cfg.visualize.color[::-1]),
            )
        return results, vis
