"""Exact-text differential test of the extraction prompt builder against
the REAL reference (yomitoku/extractor/prompt.py): same semantic input +
schema must yield byte-identical system and user messages."""

import importlib.util
import sys
import types

from yomitoku_tpu.extractor.prompt import SYSTEM_PROMPT, build_messages
from yomitoku_tpu.extractor.schema import ExtractionSchema
from yomitoku_tpu.schemas.table_semantic_parser import (
    CellSchema,
    KvItemSchema,
    TableGridSchema,
    TableSemanticContentsSchema,
    TableSemanticParserSchema,
)

from tests.torch_ref.load_reference import load_reference_semantic

REF = load_reference_semantic()


def _load_ref_prompt():
    pkg = "ref_sem"
    base = "/root/reference/src/yomitoku/extractor"
    sub = types.ModuleType(f"{pkg}.extractor")
    sub.__path__ = [base]
    sys.modules.setdefault(f"{pkg}.extractor", sub)
    for name in ("schema", "prompt"):
        modname = f"{pkg}.extractor.{name}"
        if modname in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(modname, f"{base}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        setattr(sub, name, mod)
    return sys.modules[f"{pkg}.extractor.prompt"]


REF_PROMPT = _load_ref_prompt()


def _cell(cls, cid, box, role, contents):
    return cls(
        id=cid, box=box, role=role, contents=contents,
        row=None, col=None, row_span=None, col_span=None,
    )


def _semantic(cell_cls, table_cls, kv_cls, grid_cls, parser_cls, para_cls):
    cells = {
        "c0": _cell(cell_cls, "c0", [0, 0, 100, 30], "header", "会社名"),
        "c1": _cell(cell_cls, "c1", [100, 0, 300, 30], "cell", "テスト\n株式会社"),
        "c2": _cell(cell_cls, "c2", [0, 40, 100, 70], "header", "品名"),
        "c3": _cell(cell_cls, "c3", [100, 40, 200, 70], "header", "単価"),
        "c4": _cell(cell_cls, "c4", [0, 70, 100, 100], "cell", "りんご"),
        "c5": _cell(cell_cls, "c5", [100, 70, 200, 100], "cell", "100円"),
        "c6": _cell(cell_cls, "c6", [300, 300, 360, 330], "cell", "orphan"),
        "g0c": _cell(cell_cls, "g0c", [0, 0, 400, 400], "group", "grp"),
    }
    table = table_cls(
        id="t0", box=[0, 0, 400, 400], style="border",
        cells=cells,
        kv_items=[kv_cls(id="kv0", key=["c0"], value="c1", box=[0, 0, 300, 30])],
        grids=[
            grid_cls(
                id="g0", n_row=2, n_col=2, box=[0, 40, 200, 100],
                data=[["c2", "c3"], ["c4", "c5"]],
                col_headers=[["c2"], ["c3"]],
            )
        ],
    )
    para = para_cls(
        id="p0", box=[0, 500, 200, 530], contents="パラ\nグラフ",
        score=1.0, role=None,
    )
    return parser_cls(tables=[table], paragraphs=[para], words=[])


SCHEMA_YAML_DICT = {
    "fields": [
        {"name": "company", "description": "会社名"},
        {
            "name": "items", "structure": "table", "description": "明細",
            "columns": [{"name": "item"}, {"name": "price"}],
        },
    ]
}


def test_system_prompt_identical():
    assert SYSTEM_PROMPT == REF_PROMPT.SYSTEM_PROMPT


def test_messages_identical():
    from yomitoku_tpu.schemas import Element

    ours = _semantic(
        CellSchema, TableSemanticContentsSchema, KvItemSchema,
        TableGridSchema, TableSemanticParserSchema, Element,
    )
    r = REF.schemas.table_semantic_parser
    ref = _semantic(
        r.CellSchema, r.TableSemanticContentsSchema, r.KvItemSchema,
        r.TableGridSchema, r.TableSemanticParserSchema,
        sys.modules["ref_sem.schemas.document_analyzer"].Element,
    )
    our_schema = ExtractionSchema.model_validate(SCHEMA_YAML_DICT)
    ref_schema_mod = sys.modules["ref_sem.extractor.schema"]
    ref_schema = ref_schema_mod.ExtractionSchema.model_validate(SCHEMA_YAML_DICT)

    ours_msgs = build_messages(ours, our_schema)
    ref_msgs = REF_PROMPT.build_messages(ref, ref_schema)
    assert ours_msgs[0] == ref_msgs[0]
    assert ours_msgs[1]["content"] == ref_msgs[1]["content"]


def test_messages_identical_with_table_filter():
    from yomitoku_tpu.schemas import Element

    ours = _semantic(
        CellSchema, TableSemanticContentsSchema, KvItemSchema,
        TableGridSchema, TableSemanticParserSchema, Element,
    )
    r = REF.schemas.table_semantic_parser
    ref = _semantic(
        r.CellSchema, r.TableSemanticContentsSchema, r.KvItemSchema,
        r.TableGridSchema, r.TableSemanticParserSchema,
        sys.modules["ref_sem.schemas.document_analyzer"].Element,
    )
    our_schema = ExtractionSchema.model_validate(SCHEMA_YAML_DICT)
    ref_schema = sys.modules["ref_sem.extractor.schema"].ExtractionSchema.model_validate(
        SCHEMA_YAML_DICT
    )
    for tid in ("t0", "missing"):
        o = build_messages(ours, our_schema, table_id=tid)
        rmsg = REF_PROMPT.build_messages(ref, ref_schema, table_id=tid)
        assert o[1]["content"] == rmsg[1]["content"]
