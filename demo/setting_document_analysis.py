"""DocumentAnalyzer with a user YAML overriding detector postprocess
thresholds (the config layering: dataclass defaults <- YAML <- kwargs).

Mirrors reference demo/setting_document_anaysis.py on the TPU stack.
"""

import os
import sys

# runnable from a repo clone without installing the package
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from yomitoku_tpu import DocumentAnalyzer
from yomitoku_tpu.data.functions import load_pdf

if __name__ == "__main__":
    here = os.path.dirname(__file__)
    configs = {
        "ocr": {
            "text_detector": {
                "path_cfg": os.path.join(here, "text_detector.yaml")
            }
        }
    }

    analyzer = DocumentAnalyzer(
        configs=configs,
        visualize=True,
        device=os.environ.get("DEMO_DEVICE", "tpu"),
    )

    imgs = load_pdf(os.path.join(here, "sample.pdf"))
    results, _, _ = analyzer(imgs[0])
    print(
        f"threshold override active: "
        f"{analyzer.text_detector._cfg.post_process.thresh}"
    )
    print(f"{len(results.words)} words")
