"""Full document analysis (OCR + layout + tables + reading order) over a
PDF, exporting HTML and the visualization overlays per page.

Mirrors reference demo/simple_document_analysis.py on the TPU stack.
"""


import os
import sys

# runnable from a repo clone without installing the package
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import cv2

from yomitoku_tpu import DocumentAnalyzer
from yomitoku_tpu.data.functions import load_pdf

if __name__ == "__main__":
    PATH_IMG = os.path.join(os.path.dirname(__file__), "sample.pdf")
    OUT_DIR = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(OUT_DIR, exist_ok=True)

    analyzer = DocumentAnalyzer(
        visualize=True, device=os.environ.get("DEMO_DEVICE", "tpu")
    )
    imgs = load_pdf(PATH_IMG)

    for i, img in enumerate(imgs):
        results, ocr_vis, layout_vis = analyzer(img)

        results.to_html(os.path.join(OUT_DIR, f"output_{i}.html"), img=img)

        cv2.imwrite(os.path.join(OUT_DIR, f"output_ocr_{i}.jpg"), ocr_vis)
        cv2.imwrite(
            os.path.join(OUT_DIR, f"output_layout_{i}.jpg"), layout_vis
        )
        print(
            f"page {i}: {len(results.paragraphs)} paragraphs, "
            f"{len(results.tables)} tables"
        )
