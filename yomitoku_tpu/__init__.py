"""yomitoku_tpu — a TPU-native (JAX/XLA/Pallas) Japanese Document-AI engine.

Ground-up rebuild of YomiToku's capabilities — OCR (text detection +
recognition), layout analysis, table structure/semantics, reading order,
extraction, and exporters — designed for TPU: NHWC/bf16 models compiled
with XLA, Pallas kernels for the irregular hot ops, static shape bucketing,
and data-parallel scaling over ``jax.sharding`` device meshes.
"""

__version__ = "0.1.0"

_LAZY = {
    "OCR": ".ocr",
    "TextDetector": ".text_detector",
    "TextRecognizer": ".text_recognizer",
    "LayoutAnalyzer": ".layout_analyzer",
    "LayoutParser": ".layout_parser",
    "TableStructureRecognizer": ".table_structure_recognizer",
    "TableSemanticParser": ".table_semantic_parser",
    "DocumentAnalyzer": ".document_analyzer",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = list(_LAZY) + ["__version__"]
