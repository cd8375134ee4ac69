"""Golden-output regression for the table semantic layer (reference
tests/test_table_semantic_from_json.py): canned TableDetectorSchema inputs
flow through TableSemanticParser with run_models faked; outputs compared
against the reference's golden JSONs via order-invariant metrics (grid
shape Counters, kv counts)."""

import asyncio
import json
from collections import Counter
from pathlib import Path

import numpy as np
import pytest

from yomitoku_tpu.ocr import OCRSchema
from yomitoku_tpu.schemas.table_semantic_parser import TableDetectorSchema
from yomitoku_tpu.table_semantic_parser import TableSemanticParser

INPUT_DIR = Path("/root/reference/tests/data/table_semantic_inputs")
GOLDEN_DIR = Path("/root/reference/tests/data/table_semantic_outputs")


def load_table_detector_list(json_path):
    payload = json.loads(Path(json_path).read_text(encoding="utf-8"))
    return [TableDetectorSchema.model_validate(t) for t in payload]


def extract_metrics(doc):
    tables = doc.get("tables", []) or []
    table_metrics = []
    for t in tables:
        grids = t.get("grids", []) or []
        kvs = t.get("kv_items", []) or []
        shapes = Counter(
            (int(g.get("n_row", 0)), int(g.get("n_col", 0))) for g in grids
        )
        table_metrics.append(
            {"n_grids": len(grids), "n_kv_items": len(kvs), "grid_shapes": shapes}
        )
    return {"n_tables": len(tables), "tables": table_metrics}


def normalize_table_metrics(metrics):
    def key(t):
        shapes = tuple(sorted(((k[0], k[1]), v) for k, v in t["grid_shapes"].items()))
        return (t["n_grids"], t["n_kv_items"], shapes)

    return {
        "n_tables": metrics["n_tables"],
        "tables": sorted(metrics["tables"], key=key),
    }


@pytest.fixture(scope="module")
def parser():
    # Pure-logic path: run_models is replaced per test, so skip the model
    # loading entirely (the reference fixture pays full init; we don't
    # need to).
    p = TableSemanticParser.__new__(TableSemanticParser)
    p.visualize = False
    p.merge_same_column_values = False
    return p


@pytest.mark.parametrize("idx", range(10))
def test_semantic_output_matches_golden(parser, idx):
    jf = INPUT_DIR / f"debug_table_raw_{idx}.json"
    golden_path = GOLDEN_DIR / f"debug_table_raw_{idx}.golden.json"
    tables = load_table_detector_list(jf)
    empty_ocr = OCRSchema(words=[])

    async def _fake_run_models(_img):
        return empty_ocr, tables, []

    parser.run_models = _fake_run_models
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    semantic_info, _, _ = parser(img, template=None, id=jf.stem)

    got = normalize_table_metrics(extract_metrics(semantic_info.model_dump()))
    expected = normalize_table_metrics(
        extract_metrics(json.loads(golden_path.read_text(encoding="utf-8")))
    )
    assert got == expected, f"{jf.stem}: {got} != {expected}"
