"""Dump the PyTorch reference's module outputs for the parity audit.

Run this in an environment where the REFERENCE package
(kotaro-kinoshita/yomitoku) is installed with its real checkpoints —
it cannot run in the offline TPU dev container.  It writes the same
JSON shape as ``validate_real_weights.py --emit`` so the two can be
scored with ``validate_real_weights.py --compare ours.json ref.json``:

    # reference environment
    python scripts/dump_reference_outputs.py --out ref.json demo/sample.pdf
    # this repo's environment (after download_model)
    python scripts/validate_real_weights.py --emit ours.json \
        --images demo/sample.pdf
    python scripts/validate_real_weights.py --compare ours.json ref.json

Reference APIs used: TextDetector (yomitoku/text_detector.py:112),
TextRecognizer (text_recognizer.py:227), LayoutParser
(layout_parser.py:207), load_pdf/load_image (data/functions.py:158,33).
"""

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("images", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--device", default="cuda")
    args = ap.parse_args()

    from yomitoku import LayoutParser, TextDetector, TextRecognizer
    from yomitoku.data.functions import load_image, load_pdf

    det = TextDetector(device=args.device)
    rec = TextRecognizer(device=args.device)
    lay = LayoutParser(device=args.device)

    pages = []
    for path in args.images:
        imgs = (
            load_pdf(path) if str(path).lower().endswith(".pdf")
            else load_image(path)
        )
        for img in imgs:
            d, _ = det(img)
            r, _ = rec(img, d.points)
            l, _ = lay(img)
            pages.append(
                {
                    "image": str(path),
                    "det": {"points": d.points, "scores": d.scores},
                    "rec": {
                        "contents": r.contents,
                        "scores": r.scores,
                        "points": [
                            [[int(x), int(y)] for x, y in quad]
                            for quad in r.points
                        ],
                        "directions": r.directions,
                    },
                    "layout": {
                        cat: [
                            {"box": e.box, "score": e.score, "role": e.role}
                            for e in getattr(l, cat)
                        ]
                        for cat in ("paragraphs", "tables", "figures")
                    },
                }
            )
    Path(args.out).write_text(json.dumps({"pages": pages}))
    print(f"wrote {len(pages)} page(s) to {args.out}")


if __name__ == "__main__":
    main()
