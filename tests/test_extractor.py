"""Extractor subsystem tests: schema YAML parsing, normalizer rules,
resolver, rule pipeline matching paths, prompt building (no LLM call —
reference tests/test_extractor.py strategy)."""

import json

import numpy as np
import pytest

from yomitoku_tpu.extractor.normalizer import apply_normalize, get_normalizer
from yomitoku_tpu.extractor.prompt import build_messages
from yomitoku_tpu.extractor.resolver import build_lookup, resolve_fields
from yomitoku_tpu.extractor.rule_pipeline import run_rule_extraction
from yomitoku_tpu.extractor.schema import ExtractionSchema
from yomitoku_tpu.schemas.table_semantic_parser import (
    CellSchema,
    KvItemSchema,
    TableGridSchema,
    TableSemanticContentsSchema,
    TableSemanticParserSchema,
)

# ------------------------------------------------------------------ schema


def test_schema_from_yaml(tmp_path):
    yaml_text = """
fields:
  - name: company
    description: 会社名
    type: string
  - name: total
    description: 合計金額
    type: number
    normalize: numeric
  - name: items
    structure: table
    columns:
      - name: item
        description: 品名
      - name: price
        type: number
        normalize: numeric
"""
    p = tmp_path / "schema.yaml"
    p.write_text(yaml_text, encoding="utf-8")
    schema = ExtractionSchema.from_yaml(str(p))
    assert len(schema.fields) == 3
    assert schema.fields[0].structure == "scalar"
    assert schema.fields[2].structure == "table"
    assert schema.fields[2].columns[1].normalize == "numeric"


# -------------------------------------------------------------- normalizer


@pytest.mark.parametrize(
    "rule,text,expected",
    [
        ("strip_spaces", "a b　c", "abc"),
        ("numeric", "１，２３４円", "1234"),
        ("numeric", "-1,234.5", "-1234.5"),
        ("phone_jp", "０９０－１２３４－５６７８", "090-1234-5678"),
        ("phone_jp", "0312345678", "031-234-5678"),
        ("postal_code_jp", "〒１２３４５６７", "123-4567"),
        ("date_jp", "令和6年1月15日", "2024-01-15"),
        ("date_jp", "平成31年4月30日", "2019-04-30"),
        ("date_jp", "R6.1.15", "2024-01-15"),
        ("date_jp", "2024年1月15日", "2024-01-15"),
        ("date_jp", "2024/1/15", "2024-01-15"),
        ("date_yyyymmdd", "令和6年1月15日", "20240115"),
        ("time_jp", "14:05", "14時05分"),
        ("time_jp", "9時5分", "9時05分"),
        ("time_hms", "9時5分", "09:05:00"),
        ("time_hms", "14:05:09", "14:05:09"),
        ("alphanumeric", "ＡＢＣ−１２３", "ABC123"),
        ("hiragana", "フリガナかな123", "ふりがなかな"),
        ("katakana", "ふりがなカナ123", "フリガナカナ"),
    ],
)
def test_normalizer_rules(rule, text, expected):
    assert apply_normalize(text, rule) == expected


def test_normalizer_unknown_rule_passthrough():
    assert apply_normalize("text", "nope") == "text"
    assert apply_normalize(123, None) == "123"
    assert get_normalizer("numeric") is not None


# ------------------------------------------------------------- fixtures


def _cell(cid, box, contents, role="cell", **kw):
    return CellSchema(
        id=cid, box=box, contents=contents, role=role,
        row=kw.get("row"), col=kw.get("col"),
        row_span=kw.get("row_span"), col_span=kw.get("col_span"),
    )


@pytest.fixture
def semantic_info():
    cells = {
        "c0": _cell("c0", [0, 0, 100, 30], "会社名", role="header"),
        "c1": _cell("c1", [100, 0, 300, 30], "テスト株式会社"),
        "c2": _cell("c2", [0, 30, 100, 60], "合計", role="header"),
        "c3": _cell("c3", [100, 30, 300, 60], "１，２３４円"),
        # grid: headers c4 (品名), c5 (価格); one data row c6, c7
        "c4": _cell("c4", [0, 100, 150, 130], "品名", role="header"),
        "c5": _cell("c5", [150, 100, 300, 130], "価格", role="header"),
        "c6": _cell("c6", [0, 130, 150, 160], "りんご"),
        "c7": _cell("c7", [150, 130, 300, 160], "１００円"),
    }
    table = TableSemanticContentsSchema(
        id="t0",
        style="border",
        box=[0, 0, 300, 160],
        cells=cells,
        kv_items=[
            KvItemSchema(id="kv0", key=["c0"], value="c1", box=[0, 0, 300, 30]),
            KvItemSchema(id="kv1", key=["c2"], value="c3", box=[0, 30, 300, 60]),
        ],
        grids=[
            TableGridSchema(
                id="g0", box=[0, 100, 300, 160], n_row=2, n_col=2,
                col_headers=[["c4"], ["c5"]],
                data=[["c4", "c5"], ["c6", "c7"]],
            )
        ],
    )
    return TableSemanticParserSchema(tables=[table], paragraphs=[], words=[])


# ---------------------------------------------------------- rule pipeline


def _schema(fields):
    return ExtractionSchema.model_validate({"fields": fields})


def test_rule_extract_by_cell_id(semantic_info, tmp_path):
    schema = _schema([{"name": "company", "cell_id": "c1"}])
    out = run_rule_extraction(
        semantic_info, np.zeros((10, 10, 3), np.uint8), schema,
        outdir=str(tmp_path), filename="o",
    )
    f = out["fields"]["company"]
    assert f["value"] == "テスト株式会社"
    assert f["source"] == "cell_id"
    assert f["cell_ids"] == ["c1"]
    assert (tmp_path / "o.json").exists()


def test_rule_extract_by_kv_description(semantic_info, tmp_path):
    schema = _schema(
        [{"name": "total", "description": "合計", "normalize": "numeric"}]
    )
    out = run_rule_extraction(
        semantic_info, np.zeros((10, 10, 3), np.uint8), schema,
        outdir=str(tmp_path), filename="o",
    )
    f = out["fields"]["total"]
    assert f["value"] == "1234"
    assert f["source"] == "kv"


def test_rule_extract_by_bbox(semantic_info, tmp_path):
    schema = _schema([{"name": "x", "bbox": [90, 0, 310, 35]}])
    out = run_rule_extraction(
        semantic_info, np.zeros((10, 10, 3), np.uint8), schema,
        outdir=str(tmp_path), filename="o",
    )
    assert out["fields"]["x"]["source"] == "bbox"
    assert out["fields"]["x"]["value"] == "テスト株式会社"


def test_rule_extract_by_regex(semantic_info, tmp_path):
    schema = _schema([{"name": "price", "regex": r"[０-９，]+円"}])
    out = run_rule_extraction(
        semantic_info, np.zeros((10, 10, 3), np.uint8), schema,
        outdir=str(tmp_path), filename="o",
    )
    assert out["fields"]["price"]["source"] == "regex"


def test_rule_extract_not_found(semantic_info, tmp_path):
    schema = _schema([{"name": "missing", "description": "存在しないキー"}])
    out = run_rule_extraction(
        semantic_info, np.zeros((10, 10, 3), np.uint8), schema,
        outdir=str(tmp_path), filename="o",
    )
    f = out["fields"]["missing"]
    assert f["value"] == "" and f["source"] == "not_found"


def test_rule_extract_table_field(semantic_info, tmp_path):
    schema = _schema(
        [
            {
                "name": "items",
                "structure": "table",
                "columns": [
                    {"name": "item", "description": "品名"},
                    {"name": "price", "description": "価格",
                     "normalize": "numeric"},
                ],
            }
        ]
    )
    out = run_rule_extraction(
        semantic_info, np.zeros((10, 10, 3), np.uint8), schema,
        outdir=str(tmp_path), filename="o",
    )
    f = out["fields"]["items"]
    assert f["structure"] == "table"
    assert len(f["records"]) == 1  # header-only row skipped
    rec = f["records"][0]
    assert rec["item"]["value"] == "りんご"
    assert rec["price"]["value"] == "100"
    assert rec["price"]["cell_ids"] == ["c7"]


def test_rule_extract_simple_output(semantic_info, tmp_path):
    schema = _schema([{"name": "company", "cell_id": "c1"}])
    out = run_rule_extraction(
        semantic_info, np.zeros((10, 10, 3), np.uint8), schema,
        simple=True, outdir=str(tmp_path), filename="o",
    )
    assert out == {"company": "テスト株式会社"}


# ----------------------------------------------------------------- prompt


def test_build_messages_structure(semantic_info):
    schema = _schema(
        [
            {"name": "company", "description": "会社名"},
            {
                "name": "items", "structure": "table",
                "columns": [{"name": "item"}, {"name": "price"}],
            },
        ]
    )
    messages = build_messages(semantic_info, schema)
    assert messages[0]["role"] == "system"
    assert "results" in messages[0]["content"]
    user = messages[1]["content"]
    assert "## Tables" in user and "## Extraction Schema" in user
    assert "c1" in user and "テスト株式会社" in user
    assert "structure=table" in user
    # response format is valid JSON after the prefix
    fmt = user.split("## Response Format")[-1]
    json_part = fmt[fmt.index("{"):]
    parsed = json.loads(json_part)
    assert [e["name"] for e in parsed["results"]] == ["company", "items"]


# --------------------------------------------------------------- resolver


def test_resolver_scalar_and_table(semantic_info):
    lookup = build_lookup(semantic_info)
    llm_results = [
        {
            "name": "company", "value": "テスト株式会社", "raw_text": "",
            "cell_ids": ["c1"], "confidence": "high", "source": "kv",
        },
        {
            "name": "items",
            "value": [
                {
                    "item": {"value": "りんご", "cell_ids": ["c6"]},
                    "price": {"value": "100円", "cell_ids": ["c7"]},
                }
            ],
            "raw_text": "", "cell_ids": [], "confidence": "high",
            "source": "grid",
        },
    ]
    resolved = resolve_fields(llm_results, lookup)
    assert resolved[0].elements[0].id == "c1"
    assert resolved[0].elements[0].box == [100, 0, 300, 30]
    labels = {e.label for e in resolved[1].elements}
    assert labels == {"item", "price"}


def test_resolver_dict_value_unwrap(semantic_info):
    lookup = build_lookup(semantic_info)
    resolved = resolve_fields(
        [
            {
                "name": "x",
                "value": {"value": "v", "cell_ids": ["c3"]},
                "raw_text": "", "cell_ids": [], "confidence": "low",
                "source": "kv",
            }
        ],
        lookup,
    )
    assert resolved[0].value == "v"
    assert resolved[0].elements[0].id == "c3"
