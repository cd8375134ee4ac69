"""Recognize a single pre-cropped text-line image.

Mirrors reference demo/simple_text_recognition.py on the TPU stack.
"""


import os
import sys

# runnable from a repo clone without installing the package
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import cv2

from yomitoku_tpu import TextRecognizer

if __name__ == "__main__":
    PATH_IMG = os.path.join(os.path.dirname(__file__), "sample_text.png")

    text_recognizer = TextRecognizer(
        visualize=False, device=os.environ.get("DEMO_DEVICE", "tpu")
    )

    img = cv2.imread(PATH_IMG)
    results, _ = text_recognizer(img)

    for word in results.contents:
        print("Prediction Word:", word)
