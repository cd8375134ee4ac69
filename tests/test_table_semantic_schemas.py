"""Tests for the semantic-table schema APIs: cell search, KV/grid views
and exports, table lookup, and the template system (reference pattern:
tests/test_table_semantic_parser.py)."""

import json

import pytest

from yomitoku_tpu.schemas.table_semantic_parser import (
    CellSchema,
    KvItemSchema,
    TableGridSchema,
    TableSemanticContentsSchema,
    TableSemanticParserSchema,
)


def _cell(cid, x1, y1, x2, y2, contents, role="cell"):
    return CellSchema(
        id=cid, box=[x1, y1, x2, y2], role=role, contents=contents,
        row=None, col=None, row_span=None, col_span=None,
    )


@pytest.fixture
def table():
    # 3x3 grid: header row (name, age, city) + 2 data rows,
    # plus a KV pair (company -> Acme) below the grid.
    cells = {}
    headers = ["name", "age", "city"]
    data = [["alice", "30", "tokyo"], ["bob", "41", "osaka"]]
    grid_ids = []
    cid = 0
    for r, rowvals in enumerate([headers] + data):
        row_ids = []
        for c, text in enumerate(rowvals):
            cells[str(cid)] = _cell(
                str(cid), c * 100, r * 40, (c + 1) * 100 - 2, (r + 1) * 40 - 2,
                text, role="header" if r == 0 else "cell",
            )
            row_ids.append(str(cid))
            cid += 1
        grid_ids.append(row_ids)
    # KV pair below
    cells["k"] = _cell("k", 0, 200, 98, 238, "company", role="header")
    cells["v"] = _cell("v", 100, 200, 298, 238, "Acme", role="cell")

    # col_headers is COLUMN-major: col_headers[col] = header ids of that
    # column (reference grid_parser._get_col_headers_from_grid)
    col_headers = [[grid_ids[0][c]] for c in range(3)]
    grid = TableGridSchema(
        id="g0", box=[0, 0, 298, 118], n_row=2, n_col=3,
        col_headers=col_headers, data=grid_ids[1:],
    )
    kv = KvItemSchema(id="kv0", key=["k"], value="v")
    return TableSemanticContentsSchema(
        id="t0", style="border", box=[0, 0, 300, 240],
        cells=cells, kv_items=[kv], grids=[grid],
    )


@pytest.fixture
def result(table):
    return TableSemanticParserSchema(tables=[table], paragraphs=[], words=[])


def test_find_cell_by_id(table):
    assert table.find_cell_by_id("4").contents == "30"
    assert table.find_cell_by_id(4).contents == "30"
    assert table.find_cell_by_id("nope") is None


def test_search_cells_by_bbox(table):
    got = table.search_cells_by_bbox([0, 0, 300, 40])
    assert sorted(c.contents for c in got) == ["age", "city", "name"]


def test_search_cells_by_query(table):
    assert [c.id for c in table.search_cells_by_query("alice")] == ["3"]
    assert table.search_cells_by_query("zzz") == []


def test_search_adjacent_cells(table):
    below = table.search_cells_below_key_text("name")
    assert "alice" in [c.contents for c in below]
    right = table.search_cells_right_of_key_text("alice")
    assert [c.contents for c in right] == ["30"]
    left = table.search_cells_left_of_key_text("30")
    assert "alice" in [c.contents for c in left]
    upper = table.search_cells_upper_key_text("alice")
    assert "name" in [c.contents for c in upper]


def test_search_kv_items_by_key(table):
    hits = table.search_kv_items_by_key("company")
    assert len(hits) == 1 and hits[0]["value"].contents == "Acme"
    # grid column headers are searchable as keys too
    col_hits = table.search_kv_items_by_key("age")
    assert sorted(h["value"].contents for h in col_hits) == ["30", "41"]


def test_view_facades(table):
    kv = table.view.kv_items_to_dict()
    assert kv == {"company": "Acme"}
    grids = table.view.grids_to_dict()
    assert grids[0]["rows"][0] == {"name": "alice", "age": "30", "city": "tokyo"}
    assert grids[0]["rows"][1] == {"name": "bob", "age": "41", "city": "osaka"}


def test_export_facades(table, tmp_path):
    table.export.grids_to_csv(out_path=str(tmp_path / "grid.csv"))
    # one file per grid: <basename>_<grid_id>.csv
    text = (tmp_path / "grid_g0.csv").read_text()
    assert "alice" in text

    gj = tmp_path / "grids.json"
    table.export.grids_to_json(out_path=str(gj))
    assert "tokyo" in gj.read_text()

    kj = tmp_path / "kv.json"
    table.export.kv_items_to_json(out_path=str(kj))
    assert "Acme" in kj.read_text()


def test_find_table_and_words(result, table):
    assert result.find_table_by_id("t0") is table
    assert result.find_table_by_id("xx") is None
    assert result.find_table_by_position([0, 0, 310, 250]) is table
    assert result.search_kv_items_by_key("company")


def test_to_dict_and_csv(result, tmp_path):
    d = result.to_dict()
    assert d["t0"]["kv_items"] == {"company": "Acme"}
    result.to_csv(str(tmp_path))
    # to_csv -> table_<id>.csv base; grids_to_csv appends _<grid_id>
    files = list(tmp_path.glob("table_t0*.csv"))
    assert files and "alice" in files[0].read_text()


def test_json_roundtrip(result, tmp_path):
    p = tmp_path / "res.json"
    p.write_text(json.dumps(result.model_dump()), encoding="utf-8")
    loaded = TableSemanticParserSchema.load_json(str(p))
    assert loaded.tables[0].view.kv_items_to_dict() == {"company": "Acme"}


def test_template_roundtrip(result, tmp_path):
    tp = tmp_path / "template.json"
    result.save_template_json(str(tp))
    data = json.loads(tp.read_text())
    assert data["tables"][0]["id"] == "t0"

    # mutate roles, then re-apply the template to restore them
    t = result.tables[0]
    t.cells["0"].role = "cell"
    t.cells["0"].contents = "corrupted"
    result.load_template_json(str(tp))
    assert t.cells["0"].role == "header"
