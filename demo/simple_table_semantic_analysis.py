"""Semantic table parsing: cells -> key-value items and grids, with the
search/view facades.

Mirrors reference demo/simple_table_semantic_analysis.py on the TPU
stack, using the bundled table image.
"""

import os
import sys
from pprint import pprint

# runnable from a repo clone without installing the package
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import cv2

from yomitoku_tpu.data.functions import load_image
from yomitoku_tpu.table_semantic_parser import TableSemanticParser

if __name__ == "__main__":
    PATH_IMG = os.path.join(os.path.dirname(__file__), "sample_table.png")
    OUT_DIR = os.path.join(os.path.dirname(__file__), "output")
    os.makedirs(OUT_DIR, exist_ok=True)

    analyzer = TableSemanticParser(
        device=os.environ.get("DEMO_DEVICE", "tpu"),
        visualize=True,
    )

    imgs = load_image(PATH_IMG)
    results, vis_layout, vis_ocr = analyzer(imgs[0], grid_only=False)

    # save the parse as JSON
    results.to_json(os.path.join(OUT_DIR, "result.json"))

    # visualize the OCR reads and the detected cells
    cv2.imwrite(os.path.join(OUT_DIR, "vis_ocr.jpg"), vis_ocr)
    cv2.imwrite(os.path.join(OUT_DIR, "vis_cell.jpg"), vis_layout)

    # query the structured result: table "t0"'s key-value items and grids
    table = results.find_table_by_id(table_id="t0")
    if table is not None:
        pprint(table.view.kv_items_to_dict(merge_values=True))
        pprint(table.view.grids_to_dict())
    else:
        print("no table detected (random weights?)")
