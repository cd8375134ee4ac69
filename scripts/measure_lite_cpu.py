"""Measure the --lite CPU mode: DocumentAnalyzer pages/sec and recognizer
lines/sec on the JAX CPU backend (the reference's --lite = parseq-tiny +
ONNX DBNet on CPU, cli/main.py:505-514; ours = parseq-tiny + the
reduced-resolution dbnetv2_1-lite detector).

Run:  JAX_PLATFORMS=cpu python scripts/measure_lite_cpu.py [page.pdf|img]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from yomitoku_tpu.data import load_image, load_pdf
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/demo/sample.pdf"
    if src.lower().endswith(".pdf"):
        pages = list(load_pdf(src))
    else:
        pages = load_image(src)
    img = pages[0]
    print(f"page: {img.shape[1]}x{img.shape[0]}")

    analyzer = DocumentAnalyzer(
        configs={
            "ocr": {
                "text_detector": {"model_name": "dbnetv2_1-lite"},
                "text_recognizer": {"model_name": "parseq-tiny"},
            }
        },
        device="cpu",
    )

    # warmup (compile)
    t0 = time.perf_counter()
    result, _, _ = analyzer(img)
    compile_s = time.perf_counter() - t0
    n_words = len(result.words)
    print(f"warmup (incl. compile): {compile_s:.1f}s, {n_words} words detected")

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        analyzer(img)
    page_s = (time.perf_counter() - t0) / iters
    print(f"lite e2e: {page_s:.2f} s/page = {1 / page_s:.3f} pages/s (CPU)")

    # recognizer-only lines/sec at a full 32-line batch
    rec = analyzer.text_recognizer
    h, w = rec._cfg.data.img_size
    batch = np.random.RandomState(0).randint(
        0, 255, (32, h, w, 3), dtype=np.uint8
    ).astype(np.float32)
    rec.model.forward_tokens(batch)  # compile
    t0 = time.perf_counter()
    rec.model.forward_tokens(batch)
    lines_s = 32 / (time.perf_counter() - t0)
    print(f"parseq-tiny recognizer: {lines_s:.2f} lines/s (CPU, b32)")


if __name__ == "__main__":
    main()
