"""Minimal OCR over a PDF: detection + recognition per page.

Mirrors reference demo/simple_ocr.py (CUDA) on the TPU stack; pass
device="cpu" to run anywhere.  Without downloaded checkpoints the models
fall back to random weights with a warning — the pipeline still runs end
to end (run `download_model` first for real predictions).
"""


import os
import sys

# runnable from a repo clone without installing the package
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import cv2

from yomitoku_tpu import OCR
from yomitoku_tpu.data.functions import load_pdf

if __name__ == "__main__":
    PATH_IMG = os.path.join(os.path.dirname(__file__), "sample.pdf")
    OUT_DIR = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(OUT_DIR, exist_ok=True)

    ocr = OCR(visualize=True, device=os.environ.get("DEMO_DEVICE", "tpu"))
    imgs = load_pdf(PATH_IMG)

    for i, img in enumerate(imgs):
        results, ocr_vis = ocr(img)

        results.to_json(os.path.join(OUT_DIR, f"output_{i}.json"))
        cv2.imwrite(os.path.join(OUT_DIR, f"output_ocr_{i}.jpg"), ocr_vis)
        print(f"page {i}: {len(results.words)} words")
