"""Differential test of the rule-based extraction pipeline against the REAL
reference (yomitoku/extractor/rule_pipeline.py:23-403): the same semantic
input + extraction schema must yield identical output JSON through every
rung of the match ladder (cell_id, bbox, kv key, merge_values, cell query,
paragraph, regex over cells/paragraphs/words, table column headers), in
rich, simple, and no-normalize modes.

Both sides build their inputs through their own pydantic schemas, so the
schema search APIs (find_cell_by_id, search_cells_by_bbox/query,
search_kv_items_by_key) are covered transitively.
"""

import numpy as np
import pytest

from yomitoku_tpu.extractor.rule_pipeline import run_rule_extraction
from yomitoku_tpu.extractor.schema import ExtractionSchema
from yomitoku_tpu.schemas import Element, WordPrediction
from yomitoku_tpu.schemas.table_semantic_parser import (
    CellSchema,
    KvItemSchema,
    TableGridSchema,
    TableSemanticContentsSchema,
    TableSemanticParserSchema,
)

from tests.torch_ref.load_reference import load_reference_extractor

REF_EXT = load_reference_extractor()

import sys  # noqa: E402

_REF_SEM = sys.modules["ref_sem.schemas.table_semantic_parser"]
_REF_DOC = sys.modules["ref_sem.schemas.document_analyzer"]

IMG = np.zeros((80, 80, 3), dtype=np.uint8)


def _cell(cls, cid, box, role, contents):
    return cls(
        id=cid, box=box, role=role, contents=contents,
        row=None, col=None, row_span=None, col_span=None,
    )


def _build_semantic(cell_cls, table_cls, kv_cls, grid_cls, parser_cls,
                    para_cls, word_cls):
    cells = {
        # kv pairs
        "h0": _cell(cell_cls, "h0", [0, 0, 100, 30], "header", "会社名"),
        "c0": _cell(cell_cls, "c0", [100, 0, 300, 30], "cell", "テスト 株式会社"),
        "h1": _cell(cell_cls, "h1", [0, 30, 100, 60], "header", "電話番号"),
        "c1": _cell(cell_cls, "c1", [100, 30, 300, 60], "cell", "０３－１２３４－５６７８"),
        "h2": _cell(cell_cls, "h2", [0, 60, 100, 90], "header", "日付"),
        "c2": _cell(cell_cls, "c2", [100, 60, 300, 90], "cell", "令和6年1月2日"),
        # duplicate key "金額" for merge_values (vertical spread)
        "h3": _cell(cell_cls, "h3", [0, 90, 100, 120], "header", "金額"),
        "c3": _cell(cell_cls, "c3", [100, 90, 300, 120], "cell", "100円"),
        "h4": _cell(cell_cls, "h4", [0, 120, 100, 150], "header", "金額"),
        "c4": _cell(cell_cls, "c4", [100, 120, 300, 150], "cell", "200円"),
        # regex target inside a cell
        "c5": _cell(cell_cls, "c5", [0, 150, 300, 180], "cell",
                    "請求番号 INV-2024-001"),
        # grid cells (items table)
        "g0": _cell(cell_cls, "g0", [0, 200, 100, 230], "header", "品名"),
        "g1": _cell(cell_cls, "g1", [100, 200, 200, 230], "header", "単価"),
        "g2": _cell(cell_cls, "g2", [200, 200, 300, 230], "header", "数量"),
        "g3": _cell(cell_cls, "g3", [0, 230, 100, 260], "cell", "りんご"),
        "g4": _cell(cell_cls, "g4", [100, 230, 200, 260], "cell", "１００円"),
        "g5": _cell(cell_cls, "g5", [200, 230, 300, 260], "cell", "2"),
        "g6": _cell(cell_cls, "g6", [0, 260, 100, 290], "cell", "みかん"),
        "g7": _cell(cell_cls, "g7", [100, 260, 200, 290], "cell", "２００円"),
        # g8 intentionally absent from cells (dangling id in the grid)
        # group cell (skipped by the regex scan)
        "grp": _cell(cell_cls, "grp", [0, 0, 300, 300], "group",
                     "INV-0000-000"),
    }
    kv_items = [
        kv_cls(id="kv0", key=["h0"], value="c0", box=[0, 0, 300, 30]),
        kv_cls(id="kv1", key=["h1"], value="c1", box=[0, 30, 300, 60]),
        kv_cls(id="kv2", key=["h2"], value="c2", box=[0, 60, 300, 90]),
        kv_cls(id="kv3", key=["h3"], value="c3", box=[0, 90, 300, 120]),
        kv_cls(id="kv4", key=["h4"], value="c4", box=[0, 120, 300, 150]),
    ]
    grids = [
        grid_cls(
            id="grid0", n_row=3, n_col=3, box=[0, 200, 300, 290],
            data=[
                ["g0", "g1", "g2"],       # pure header row -> skipped
                ["g3", "g4", "g5"],
                ["g6", "g7", "g8"],       # g8 dangling (not in cells)
                [None, None, None],       # all-None row
            ],
            col_headers=[["g0"], ["g1"], ["g2"]],
        )
    ]
    table = table_cls(
        id="t0", box=[0, 0, 300, 300], style="border",
        cells=cells, kv_items=kv_items, grids=grids,
    )
    paragraphs = [
        para_cls(id="p0", box=[0, 400, 300, 430],
                 contents="お問い合わせ: support@example.com",
                 score=1.0, role=None),
        para_cls(id="p1", box=[0, 440, 300, 470],
                 contents="備考: 振込手数料は当方負担", score=1.0, role=None),
        para_cls(id=None, box=[0, 480, 300, 510],
                 contents="脚注 ANON-PARA-42", score=1.0, role=None),
    ]
    words = [
        word_cls(points=[[0, 520, ], [100, 520], [100, 540], [0, 540]],
                 content="〒123-4567", direction="horizontal",
                 rec_score=0.9, det_score=0.9),
    ]
    return parser_cls(tables=[table], paragraphs=paragraphs, words=words)


def _ours():
    return _build_semantic(
        CellSchema, TableSemanticContentsSchema, KvItemSchema,
        TableGridSchema, TableSemanticParserSchema, Element, WordPrediction,
    )


def _ref():
    return _build_semantic(
        _REF_SEM.CellSchema, _REF_SEM.TableSemanticContentsSchema,
        _REF_SEM.KvItemSchema, _REF_SEM.TableGridSchema,
        _REF_SEM.TableSemanticParserSchema, _REF_DOC.Element,
        _REF_DOC.WordPrediction,
    )


SCHEMA_DICT = {
    "fields": [
        # direct cell_id + strip_spaces normalize
        {"name": "company", "cell_id": "c0", "normalize": "strip_spaces"},
        # missing cell_id falls through to the kv rung via description
        {"name": "phone", "cell_id": "nope", "description": "電話番号",
         "normalize": "phone_jp"},
        # bbox lookup
        {"name": "by_bbox", "bbox": [100, 30, 300, 60]},
        # kv single value + date normalize
        {"name": "date", "description": "日付", "normalize": "date_jp"},
        # kv merge_values (two 金額 rows, vertical spread, custom separator)
        {"name": "amounts", "description": "金額", "merge_values": True,
         "separator": "、"},
        # description matches cell contents only -> cell_query rung
        {"name": "query_fallback", "description": "りんご"},
        # description found only inside a paragraph -> paragraph rung
        {"name": "para_fallback", "description": "振込手数料"},
        # regex: cell hit (group-role cell must be skipped)
        {"name": "invoice_no", "regex": r"INV-\d{4}-\d{3}"},
        # regex: paragraph hit
        {"name": "email", "regex": r"[\w.]+@[\w.]+"},
        # regex: paragraph with id=None (exercises the fallback id)
        {"name": "anon", "regex": r"ANON-PARA-\d+"},
        # regex: word hit
        {"name": "postal", "regex": r"〒\d{3}-\d{4}",
         "normalize": "postal_code_jp"},
        # nothing matches
        {"name": "missing", "description": "存在しない"},
        # table field: name match / description match / numeric normalize
        {"name": "items", "structure": "table", "description": "明細",
         "columns": [
             {"name": "品名"},
             {"name": "price", "description": "単価", "normalize": "numeric"},
             {"name": "qty", "cell_id": "g2"},
         ]},
        # table field with a bbox column match
        {"name": "items_bbox", "structure": "table",
         "columns": [{"name": "item", "bbox": [0, 200, 100, 230]}]},
        # table field with no columns -> not_found shape
        {"name": "empty_table", "structure": "table"},
    ]
}


def _run(side_fn, schema_cls, run_fn, tmp_path, name, **kw):
    schema = schema_cls.model_validate(SCHEMA_DICT)
    return run_fn(
        side_fn(), IMG, schema,
        outdir=str(tmp_path / name), filename="out", **kw,
    )


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"simple": True},
        {"no_normalize": True},
        {"simple": True, "no_normalize": True},
    ],
    ids=["rich", "simple", "rich-nonorm", "simple-nonorm"],
)
def test_rule_extraction_output_identical(tmp_path, kw):
    ours = _run(_ours, ExtractionSchema, run_rule_extraction,
                tmp_path, "ours", **kw)
    ref_schema_cls = sys.modules["ref_sem.extractor.schema"].ExtractionSchema
    ref = _run(_ref, ref_schema_cls, REF_EXT.rule_pipeline.run_rule_extraction,
               tmp_path, "ref", **kw)
    # Compare through a JSON round-trip: the written JSON file is the public
    # contract; in-memory the reference leaks a tuple where we use a list
    # (its quad_to_xyxy returns a tuple, reference utils/misc.py:128).
    import json

    assert json.loads(json.dumps(ours)) == json.loads(json.dumps(ref))


def test_every_ladder_rung_was_exercised(tmp_path):
    """Guard the fixture itself: each match source must appear, so a silent
    fixture regression can't turn the differential into a vacuous pass."""
    out = _run(_ours, ExtractionSchema, run_rule_extraction, tmp_path, "g")
    sources = {f["source"] for f in out["fields"].values()
               if isinstance(f, dict) and "source" in f}
    assert {"cell_id", "bbox", "kv", "cell_query", "paragraph", "regex",
            "grid", "not_found"} <= sources
