"""Load reference model-layer modules directly from /root/reference for
parity testing, bypassing the package __init__ chain (which needs
torchvision / timm / pypdfium2 — not installed here).

The reference RT-DETR layer files only need torch + omegaconf.ListConfig,
so we register a minimal omegaconf stub and mount the layers directory as
a synthetic package.  This gives parity tests against the REAL reference
implementation, not a re-typed mirror.
"""

import importlib.util
import sys
import types

_REF_LAYERS = "/root/reference/src/yomitoku/models/layers"


class ListConfig(list):
    pass


def _ensure_omegaconf_stub():
    if "omegaconf" in sys.modules:
        return
    om = types.ModuleType("omegaconf")
    om.ListConfig = ListConfig
    om.DictConfig = type("DictConfig", (dict,), {})
    om.OmegaConf = types.SimpleNamespace()
    sys.modules["omegaconf"] = om


def load_reference_rtdetr_layers():
    """Returns (rtdetr_backbone, rtdetr_hybrid_encoder, rtdetrv2_decoder)
    modules imported from the reference tree."""
    _ensure_omegaconf_stub()
    pkg_name = "ref_rtdetr_layers"
    if pkg_name in sys.modules:
        mods = sys.modules[pkg_name]
        return mods.rtdetr_backbone, mods.rtdetr_hybrid_encoder, mods.rtdetrv2_decoder

    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [_REF_LAYERS]
    sys.modules[pkg_name] = pkg
    for name in ("activate", "rtdetr_backbone", "rtdetr_hybrid_encoder",
                 "rtdetrv2_decoder"):
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{name}", f"{_REF_LAYERS}/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg.rtdetr_backbone, pkg.rtdetr_hybrid_encoder, pkg.rtdetrv2_decoder


def load_reference_module(name, path, package_files=()):
    """Load a single reference module with its relative-import deps mounted
    in a synthetic package."""
    _ensure_omegaconf_stub()
    pkg_name = f"ref_{name}"
    if pkg_name in sys.modules:
        return getattr(sys.modules[pkg_name], name)
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = list({p.rsplit("/", 1)[0] for p, _ in package_files} | {path.rsplit("/", 1)[0]})
    sys.modules[pkg_name] = pkg
    for fpath, modname in list(package_files) + [(path, name)]:
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{modname}", fpath
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{modname}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, modname, mod)
    return getattr(pkg, name)


def load_reference_reading_order():
    """Reference reading_order module (needs utils.graph / utils.misc as a
    sub-package)."""
    _ensure_omegaconf_stub()
    base = "/root/reference/src/yomitoku"
    pkg_name = "ref_reading_order_pkg"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name].reading_order
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [base]
    sys.modules[pkg_name] = pkg
    utils_pkg = types.ModuleType(f"{pkg_name}.utils")
    utils_pkg.__path__ = [f"{base}/utils"]
    sys.modules[f"{pkg_name}.utils"] = utils_pkg
    for sub in ("graph", "misc"):
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.utils.{sub}", f"{base}/utils/{sub}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.utils.{sub}"] = mod
        spec.loader.exec_module(mod)
        setattr(utils_pkg, sub, mod)
    spec = importlib.util.spec_from_file_location(
        f"{pkg_name}.reading_order", f"{base}/reading_order.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{pkg_name}.reading_order"] = mod
    spec.loader.exec_module(mod)
    pkg.reading_order = mod
    return mod


def load_reference_semantic():
    """Mount the reference's PURE table-semantic stack (grid_parser,
    kv_parser, the clustering helpers in table_semantic_parser) with the
    neural-model modules stubbed out (they pull torchvision/timm, absent
    here).  Returns the synthetic package."""
    _ensure_omegaconf_stub()
    base = "/root/reference/src/yomitoku"
    pkg_name = "ref_sem"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]

    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [base]
    sys.modules[pkg_name] = pkg

    def _sub(name, path):
        sub = types.ModuleType(f"{pkg_name}.{name}")
        sub.__path__ = [path]
        sys.modules[f"{pkg_name}.{name}"] = sub
        setattr(pkg, name, sub)
        return sub

    def _load(modname, fpath):
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{modname}", fpath
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{modname}"] = mod
        spec.loader.exec_module(mod)
        parent, _, leaf = modname.rpartition(".")
        setattr(sys.modules[f"{pkg_name}.{parent}" if parent else pkg_name],
                leaf, mod)
        return mod

    _sub("utils", f"{base}/utils")
    for m in ("logger", "graph", "misc", "union_find", "visualizer"):
        _load(f"utils.{m}", f"{base}/utils/{m}.py")
    _sub("export", f"{base}/export")
    for m in ("export_csv", "export_html", "export_json", "export_markdown"):
        _load(f"export.{m}", f"{base}/export/{m}.py")
    _load("export.__init__", f"{base}/export/__init__.py")
    # re-point the package module to the loaded __init__
    sys.modules[f"{pkg_name}.export"] = sys.modules[f"{pkg_name}.export.__init__"]
    pkg.export = sys.modules[f"{pkg_name}.export"]
    pkg.export.__path__ = [f"{base}/export"]

    _load("base", f"{base}/base.py")
    _load("reading_order", f"{base}/reading_order.py")
    _sub("schemas", f"{base}/schemas")
    _load("schemas.document_analyzer", f"{base}/schemas/document_analyzer.py")
    _load("schemas.__init__", f"{base}/schemas/__init__.py")
    sys.modules[f"{pkg_name}.schemas"] = sys.modules[
        f"{pkg_name}.schemas.__init__"
    ]
    pkg.schemas = sys.modules[f"{pkg_name}.schemas"]
    pkg.schemas.__path__ = [f"{base}/schemas"]
    _load("schemas.table_semantic_parser",
          f"{base}/schemas/table_semantic_parser.py")
    _load("grid_parser", f"{base}/grid_parser.py")
    _load("kv_parser", f"{base}/kv_parser.py")

    # stub the neural modules table_semantic_parser imports
    for name, attrs in (
        ("layout_parser", {"LayoutParser": object}),
        ("table_cell_detector", {"CellDetector": object}),
        ("text_detector", {"TextDetector": object}),
        ("text_recognizer", {"TextRecognizer": object}),
        ("ocr", {"OCRSchema": object, "ocr_aggregate": lambda *a, **k: None}),
    ):
        stub = types.ModuleType(f"{pkg_name}.{name}")
        for k, v in attrs.items():
            setattr(stub, k, v)
        sys.modules[f"{pkg_name}.{name}"] = stub
        setattr(pkg, name, stub)

    _load("table_semantic_parser", f"{base}/table_semantic_parser.py")
    return pkg


def load_reference_document_analyzer():
    """Mount the reference document_analyzer module (the pure aggregation
    helpers) with its neural-module imports stubbed.  Follows the
    load_reference_semantic pattern; additionally stubs the reference's
    ABSOLUTE imports (yomitoku.text_detector / yomitoku.text_recognizer,
    document_analyzer.py:8-9)."""
    _ensure_omegaconf_stub()
    base = "/root/reference/src/yomitoku"
    pkg_name = "ref_docan"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name].document_analyzer

    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [base]
    sys.modules[pkg_name] = pkg

    def _load(modname, fpath):
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{modname}", fpath
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{modname}"] = mod
        spec.loader.exec_module(mod)
        parent, _, leaf = modname.rpartition(".")
        setattr(sys.modules[f"{pkg_name}.{parent}" if parent else pkg_name],
                leaf, mod)
        return mod

    utils_pkg = types.ModuleType(f"{pkg_name}.utils")
    utils_pkg.__path__ = [f"{base}/utils"]
    sys.modules[f"{pkg_name}.utils"] = utils_pkg
    pkg.utils = utils_pkg
    for m in ("logger", "graph", "misc", "visualizer"):
        _load(f"utils.{m}", f"{base}/utils/{m}.py")

    export_pkg = types.ModuleType(f"{pkg_name}.export")
    export_pkg.__path__ = [f"{base}/export"]
    sys.modules[f"{pkg_name}.export"] = export_pkg
    pkg.export = export_pkg
    for m in ("export_csv", "export_html", "export_json", "export_markdown"):
        _load(f"export.{m}", f"{base}/export/{m}.py")
    for m in ("export_csv", "export_html", "export_json", "export_markdown"):
        mod = sys.modules[f"{pkg_name}.export.{m}"]
        for attr in dir(mod):
            if attr.startswith(("convert_", "export_", "save_")):
                setattr(export_pkg, attr, getattr(mod, attr))

    _load("reading_order", f"{base}/reading_order.py")
    schemas_pkg = types.ModuleType(f"{pkg_name}.schemas")
    schemas_pkg.__path__ = [f"{base}/schemas"]
    sys.modules[f"{pkg_name}.schemas"] = schemas_pkg
    pkg.schemas = schemas_pkg
    mod = _load("schemas.document_analyzer",
                f"{base}/schemas/document_analyzer.py")
    for attr in dir(mod):
        if attr.endswith("Schema"):
            setattr(schemas_pkg, attr, getattr(mod, attr))

    # stubs: relative neural imports + the reference's absolute imports
    for name, attrs in (
        ("layout_analyzer", {"LayoutAnalyzer": object}),
        ("ocr", {"OCRSchema": object, "ocr_aggregate": lambda *a, **k: []}),
    ):
        stub = types.ModuleType(f"{pkg_name}.{name}")
        for k, v in attrs.items():
            setattr(stub, k, v)
        sys.modules[f"{pkg_name}.{name}"] = stub
        setattr(pkg, name, stub)
    if "yomitoku" not in sys.modules:
        ytk = types.ModuleType("yomitoku")
        ytk.__path__ = []
        sys.modules["yomitoku"] = ytk
    for name, attr in (("text_detector", "TextDetector"),
                       ("text_recognizer", "TextRecognizer")):
        full = f"yomitoku.{name}"
        if full not in sys.modules:
            stub = types.ModuleType(full)
            setattr(stub, attr, object)
            sys.modules[full] = stub

    return _load("document_analyzer", f"{base}/document_analyzer.py")


def build_reference_rtdetr(cfg):
    """Assemble the reference RTDETRv2 (backbone/encoder/decoder attribute
    names match yomitoku/models/rtdetr.py:9 so state_dict prefixes line
    up)."""
    import torch.nn as nn

    backbone_mod, encoder_mod, decoder_mod = load_reference_rtdetr_layers()

    dec_kwargs = dict(cfg.RTDETRTransformerv2)
    # The reference relies on OmegaConf ListConfig for num_points
    # (rtdetrv2_decoder.py:76-83: a plain list falls through to the
    # scalar branch); reproduce that environment.
    dec_kwargs["num_points"] = ListConfig(dec_kwargs["num_points"])
    dec_kwargs["feat_channels"] = list(dec_kwargs["feat_channels"])
    dec_kwargs["feat_strides"] = list(dec_kwargs["feat_strides"])
    dec_kwargs["eval_spatial_size"] = list(dec_kwargs["eval_spatial_size"])

    class RefRTDETRv2(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = backbone_mod.PResNet(**cfg.PResNet)
            self.encoder = encoder_mod.HybridEncoder(
                **{k: (list(v) if isinstance(v, list) else v)
                   for k, v in cfg.HybridEncoder.items()}
            )
            self.decoder = decoder_mod.RTDETRTransformerv2(**dec_kwargs)

        def forward(self, x):
            return self.decoder(self.encoder(self.backbone(x)))

    return RefRTDETRv2()


def load_reference_extractor():
    """Mount the reference extractor package (schema / normalizer / resolver /
    llm_client / prompt / visualizer / pipeline / rule_pipeline,
    reference extractor/rule_pipeline.py:23-403) on top of the ref_sem
    semantic stack, for differential tests of rule extraction.

    The reference's ``jaconv`` wheel is absent in this environment; it is
    stubbed with yomitoku_tpu.utils.jp_text (same function surface:
    z2h/h2z/kata2hira/hira2kata), so both sides are pinned to identical
    width-conversion behavior and the differential isolates the pipeline
    logic itself."""
    pkg = load_reference_semantic()
    pkg_name = "ref_sem"
    base = "/root/reference/src/yomitoku"
    if hasattr(pkg, "extractor") and hasattr(pkg.extractor, "rule_pipeline"):
        return pkg.extractor

    if "jaconv" not in sys.modules:
        from yomitoku_tpu.utils import jp_text

        ja = types.ModuleType("jaconv")
        ja.z2h = jp_text.z2h
        ja.h2z = jp_text.h2z
        ja.kata2hira = jp_text.kata2hira
        ja.hira2kata = jp_text.hira2kata
        sys.modules["jaconv"] = ja

    def _load(modname, fpath):
        full = f"{pkg_name}.{modname}"
        if full in sys.modules:
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(full, fpath)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        parent, _, leaf = modname.rpartition(".")
        setattr(sys.modules[f"{pkg_name}.{parent}" if parent else pkg_name],
                leaf, mod)
        return mod

    if f"{pkg_name}.constants" not in sys.modules:
        _load("constants", f"{base}/constants.py")

    sub_name = f"{pkg_name}.extractor"
    if sub_name not in sys.modules:
        sub = types.ModuleType(sub_name)
        sub.__path__ = [f"{base}/extractor"]
        sys.modules[sub_name] = sub
        pkg.extractor = sub
    else:
        pkg.extractor = sys.modules[sub_name]

    for m in ("schema", "normalizer", "resolver", "llm_client", "prompt",
              "visualizer", "pipeline", "rule_pipeline"):
        _load(f"extractor.{m}", f"{base}/extractor/{m}.py")
    return pkg.extractor
