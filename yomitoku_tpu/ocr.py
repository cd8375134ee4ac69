"""OCR pipeline: text detection -> line recognition -> word aggregation.

Reference parity: yomitoku/ocr.py.
"""

from .schemas import OCRSchema
from .text_detector import TextDetector
from .text_recognizer import TextRecognizer


def ocr_aggregate(det_outputs, rec_outputs):
    words = []
    for points, det_score, pred, rec_score, direction in zip(
        rec_outputs.points,
        det_outputs.scores,
        rec_outputs.contents,
        rec_outputs.scores,
        rec_outputs.directions,
    ):
        words.append(
            {
                "points": points,
                "content": pred,
                "direction": direction,
                "det_score": det_score,
                "rec_score": rec_score,
            }
        )
    return words


class OCR:
    def __init__(self, configs=None, device="tpu", visualize=False,
                 num_devices=None):
        configs = configs or {}
        if not isinstance(configs, dict):
            raise ValueError("configs must be a dict.")
        det_kwargs = {"device": device, "visualize": visualize,
                      "num_devices": num_devices}
        rec_kwargs = dict(det_kwargs)
        det_kwargs.update(configs.get("text_detector", {}))
        rec_kwargs.update(configs.get("text_recognizer", {}))

        self.detector = TextDetector(**det_kwargs)
        self.recognizer = TextRecognizer(**rec_kwargs)

    def __call__(self, img):
        """Run OCR on a BGR image -> (OCRSchema, vis)."""
        from .ops.device_crop import DevicePage, device_crops_enabled

        page = DevicePage(img) if device_crops_enabled() else None
        det_outputs, vis = self.detector(img, page=page)
        rec_outputs, vis = self.recognizer(
            img, det_outputs.points, vis=vis, page=page
        )
        words = ocr_aggregate(det_outputs, rec_outputs)
        return OCRSchema(words=words), vis
