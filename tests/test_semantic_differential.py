"""Differential fuzzing of the table-semantic layer against the REAL
reference implementation (loaded from /root/reference with the neural
modules stubbed — see torch_ref/load_reference.py).

For randomized synthetic tables (regular grids, span merges, jitter, KV
pairs, scattered cells) the clustering + grid/KV parse of this framework
must produce the same grids (id matrices, col headers) and the same KV
items as the reference."""

import numpy as np
import pytest

import yomitoku_tpu.table_semantic_parser as ours_tsp
from yomitoku_tpu.grid_parser import parse_grid_from_bottom_up as ours_grid
from yomitoku_tpu.kv_parser import parse_kv_items as ours_kv
from yomitoku_tpu.schemas.table_semantic_parser import CellSchema as OurCell

from tests.torch_ref.load_reference import load_reference_semantic

REF = load_reference_semantic()
RefCell = REF.schemas.table_semantic_parser.CellSchema


def _mk_cells(dicts, cls):
    return [
        cls(
            id=d["id"], box=d["box"], role=d["role"], contents=d["contents"],
            row=None, col=None, row_span=None, col_span=None,
        )
        for d in dicts
    ]


def _drive(cells, split, cluster, get_cluster_nodes, is_grid, grid_fn, kv_fn):
    """Mirror of the TableSemanticParser per-table flow (both codebases)."""
    cells_by_id = {c.id: c for c in cells}
    nodes = split(cells)
    clusters, _ = cluster(nodes)
    cluster_nodes_list = get_cluster_nodes(clusters, nodes)
    grids, kv_items = [], []
    for clustered in cluster_nodes_list:
        if is_grid(clustered):
            parsed = grid_fn(cells_by_id, clustered, False)
            if parsed is not None:
                grids.append(parsed[0])
        else:
            items, _, _ = kv_fn(clustered, nodes, cells_by_id)
            kv_items.extend(items)
    return grids, kv_items, cells_by_id


def _run_ours(dicts):
    cells = _mk_cells(dicts, OurCell)
    return _drive(
        cells,
        ours_tsp._split_nodes_with_role,
        ours_tsp._weakly_cluster_nodes_with_graph,
        ours_tsp._get_cluster_nodes,
        ours_tsp.is_grid_cluster,
        ours_grid,
        ours_kv,
    )


def _run_ref(dicts):
    t = REF.table_semantic_parser
    cells = _mk_cells(dicts, RefCell)
    return _drive(
        cells,
        t._split_nodes_with_role,
        t._weakly_cluster_nodes_with_graph,
        t._get_cluster_nodes,
        t.is_grid_cluster,
        REF.grid_parser.parse_grid_from_bottom_up,
        REF.kv_parser.parse_kv_items,
    )


def _grid_signature(grids, cells_by_id):
    sig = []
    for g in grids:
        data = [
            [cells_by_id[c].contents if c is not None else None for c in row]
            for row in g.data
        ]
        headers = [
            [cells_by_id[c].contents for c in row] for row in g.col_headers
        ]
        sig.append((g.n_row, g.n_col, tuple(map(tuple, headers)),
                    tuple(map(tuple, data))))
    return sorted(sig)


def _kv_signature(items, cells_by_id):
    return sorted(
        (
            tuple(cells_by_id[k].contents for k in kv.key),
            cells_by_id[kv.value].contents,
        )
        for kv in items
    )


def _compare(dicts):
    og, ok_, ocells = _run_ours(dicts)
    rg, rk, rcells = _run_ref(dicts)
    assert _grid_signature(og, ocells) == _grid_signature(rg, rcells)
    assert _kv_signature(ok_, ocells) == _kv_signature(rk, rcells)


def _grid_table(rng, rows, cols, jitter=0, span=False, header_row=True):
    """Synthetic table: rows x cols lattice with optional jitter/spans."""
    cw, ch = 80, 30
    dicts = []
    cid = 0
    occupied = set()
    if span and rows > 2 and cols > 2:
        r0 = rng.randint(1, rows - 1)
        c0 = rng.randint(0, cols - 1)
        occupied = {(r0, c0), (r0 + 1, c0)}  # 2-row span
        dicts.append({
            "id": f"c{cid}", "role": "cell", "contents": f"span{cid}",
            "box": [c0 * cw, r0 * ch, (c0 + 1) * cw - 2, (r0 + 2) * ch - 2],
        })
        cid += 1
    for r in range(rows):
        for c in range(cols):
            if (r, c) in occupied:
                continue
            jx = rng.randint(-jitter, jitter + 1) if jitter else 0
            jy = rng.randint(-jitter, jitter + 1) if jitter else 0
            role = "header" if (header_row and r == 0) else "cell"
            dicts.append({
                "id": f"c{cid}", "role": role,
                "contents": f"v{r}_{c}",
                "box": [c * cw + jx, r * ch + jy,
                        (c + 1) * cw - 2 + jx, (r + 1) * ch - 2 + jy],
            })
            cid += 1
    return dicts


def _kv_table(rng, n_pairs):
    """header->cell horizontal pairs stacked vertically (classic KV form)."""
    dicts = []
    for i in range(n_pairs):
        y = i * 40
        dicts.append({
            "id": f"k{i}", "role": "header", "contents": f"key{i}",
            "box": [0, y, 98, y + 38],
        })
        dicts.append({
            "id": f"v{i}", "role": "cell", "contents": f"val{i}",
            "box": [100, y, 260, y + 38],
        })
    return dicts


def test_regular_grids():
    for seed in range(6):
        rng = np.random.RandomState(seed)
        rows, cols = rng.randint(2, 7), rng.randint(2, 6)
        _compare(_grid_table(rng, rows, cols))


def test_jittered_grids():
    for seed in range(6):
        rng = np.random.RandomState(100 + seed)
        _compare(_grid_table(rng, rng.randint(3, 6), rng.randint(3, 6),
                             jitter=3))


def test_grids_with_spans():
    for seed in range(6):
        rng = np.random.RandomState(200 + seed)
        _compare(_grid_table(rng, rng.randint(4, 7), rng.randint(3, 6),
                             span=True))


def test_kv_forms():
    for seed in range(4):
        rng = np.random.RandomState(300 + seed)
        _compare(_kv_table(rng, rng.randint(2, 7)))


def test_mixed_grid_and_kv():
    rng = np.random.RandomState(42)
    grid = _grid_table(rng, 4, 4)
    kv = _kv_table(rng, 3)
    # offset the KV block far below the grid so they cluster separately
    for d in kv:
        d["id"] = "kv_" + d["id"]
        d["box"] = [d["box"][0], d["box"][1] + 500,
                    d["box"][2], d["box"][3] + 500]
    _compare(grid + kv)


def test_scattered_random_cells():
    """No structure at all — both sides must still agree."""
    for seed in range(4):
        rng = np.random.RandomState(400 + seed)
        dicts = []
        for i in range(rng.randint(3, 12)):
            x, y = rng.randint(0, 400), rng.randint(0, 400)
            w, h = rng.randint(20, 120), rng.randint(15, 50)
            dicts.append({
                "id": f"r{i}",
                "role": rng.choice(["cell", "header", "empty"]),
                "contents": f"t{i}",
                "box": [x, y, x + w, y + h],
            })
        _compare(dicts)


def _spanned_grid(rng, rows, cols, n_spans):
    """Lattice with several random row- or col-spans (exercises the 1:N
    fan-out splitting on every axis)."""
    cw, ch = 80, 30
    occupied, spans = set(), []
    for _ in range(n_spans):
        horiz = bool(rng.randint(2))
        if horiz and cols > 2:
            r = rng.randint(0, rows)
            c = rng.randint(0, cols - 1)
            slots = {(r, c), (r, c + 1)}
        elif rows > 2:
            r = rng.randint(0, rows - 1)
            c = rng.randint(0, cols)
            slots = {(r, c), (r + 1, c)}
        else:
            continue
        if slots & occupied:
            continue
        occupied |= slots
        rs = sorted({s[0] for s in slots})
        cs = sorted({s[1] for s in slots})
        spans.append([cs[0] * cw, rs[0] * ch,
                      (cs[-1] + 1) * cw - 2, (rs[-1] + 1) * ch - 2])
    dicts = []
    cid = 0
    for box in spans:
        dicts.append({"id": f"c{cid}", "role": "cell",
                      "contents": f"span{cid}", "box": box})
        cid += 1
    for r in range(rows):
        for c in range(cols):
            if (r, c) in occupied:
                continue
            role = "header" if r == 0 else "cell"
            dicts.append({
                "id": f"c{cid}", "role": role, "contents": f"v{r}_{c}",
                "box": [c * cw, r * ch, (c + 1) * cw - 2, (r + 1) * ch - 2],
            })
            cid += 1
    return dicts


def test_multi_span_grids():
    for seed in range(8):
        rng = np.random.RandomState(500 + seed)
        _compare(_spanned_grid(rng, rng.randint(3, 7), rng.randint(3, 7),
                               rng.randint(1, 4)))


def test_grids_with_holes():
    for seed in range(6):
        rng = np.random.RandomState(600 + seed)
        dicts = _grid_table(rng, rng.randint(3, 6), rng.randint(3, 6))
        # punch random holes (drop cells entirely)
        keep = [d for d in dicts
                if rng.rand() > 0.15 or d["role"] == "header"]
        if len(keep) >= 4:
            _compare(keep)


def test_merge_same_column_values():
    """merge_same_column_values=True path of the grid parser."""
    for seed in range(4):
        rng = np.random.RandomState(700 + seed)
        dicts = _grid_table(rng, rng.randint(3, 6), rng.randint(3, 6))
        ours_cells = {c.id: c for c in _mk_cells(dicts, OurCell)}
        ref_cells = {c.id: c for c in _mk_cells(dicts, RefCell)}
        o_nodes = ours_tsp._split_nodes_with_role(list(ours_cells.values()))
        r_nodes = REF.table_semantic_parser._split_nodes_with_role(
            list(ref_cells.values())
        )
        o = ours_grid(ours_cells, o_nodes, True)
        r = REF.grid_parser.parse_grid_from_bottom_up(ref_cells, r_nodes, True)
        assert (o is None) == (r is None)
        if o is None:
            continue
        og, ocells, _ = o
        rg, rcells, _ = r
        assert _grid_signature([og], ocells) == _grid_signature([rg], rcells)
