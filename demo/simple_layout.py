"""Layout analysis only (regions + table structure), no OCR.

Mirrors reference demo/simple_layout.py on the TPU stack.
"""


import os
import sys

# runnable from a repo clone without installing the package
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import cv2

from yomitoku_tpu import LayoutAnalyzer
from yomitoku_tpu.data.functions import load_pdf

if __name__ == "__main__":
    PATH_IMG = os.path.join(os.path.dirname(__file__), "sample.pdf")
    OUT_DIR = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(OUT_DIR, exist_ok=True)

    analyzer = LayoutAnalyzer(
        visualize=True, device=os.environ.get("DEMO_DEVICE", "tpu")
    )

    imgs = load_pdf(PATH_IMG)
    for i, img in enumerate(imgs):
        results, layout_vis = analyzer(img)

        results.to_json(os.path.join(OUT_DIR, f"output_{i}.json"))
        cv2.imwrite(
            os.path.join(OUT_DIR, f"output_layout_{i}.jpg"), layout_vis
        )
        print(f"page {i}: {len(results.tables)} tables")
