"""End-to-end TableSemanticParser structure test: the real semantic
pipeline (fused det+layout+cell device program, device line crops,
contours, cell postprocess + hole mining, clustering, grid/kv parsing,
id assignment) driven on the bench's synthetic workload with pinned
prediction contents — asserts the structural invariants that random
weights can't change.  Mirrors what bench.run_semantic_e2e measures."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import bench  # noqa: E402  (repo root on sys.path via conftest)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def analyzed():
    import yomitoku_tpu.ops.device_crop as dc
    from yomitoku_tpu.table_semantic_parser import TableSemanticParser

    real_enabled = dc.device_crops_enabled
    dc.device_crops_enabled = lambda: True
    try:
        img, quads, paragraphs, tables, figure_box = bench._build_workload()
        parser = TableSemanticParser(
            configs={
                "table_detector": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
                "table_cell_parser": {
                    "path_cfg": "tests/yaml/layout_small.yaml",
                    "from_pretrained": False,
                },
                "text_detector": {
                    "path_cfg": "tests/yaml/det_small.yaml",
                    "from_pretrained": False,
                },
                "text_recognizer": {
                    "path_cfg": "tests/yaml/rec_small.yaml",
                    "from_pretrained": False,
                },
            },
            device="cpu",
            visualize=False,
        )
        bench._pin_semantic_parser(
            parser, img, quads, paragraphs, tables, figure_box,
            paint_shape=(1, 640, 480),
        )
        semantic, _, _ = parser(img)
        # keep the patch active for every test in the module (batch()
        # must take the same device-crop path as the single run)
        yield img, quads, paragraphs, tables, semantic, parser
    finally:
        dc.device_crops_enabled = real_enabled


def test_fused_semantic_program_ran(analyzed):
    *_, parser = analyzed
    assert parser._fused_page_program is not None


def test_words_cover_painted_lines(analyzed):
    img, quads, paragraphs, tables, semantic, parser = analyzed
    # every painted line (and no gutter speckle) must survive contours +
    # recognition into the word list
    assert len(semantic.words) == len(quads)


def test_tables_have_grid_structure(analyzed):
    *_, semantic, parser = analyzed
    # the pinned 4x4 cell grids must cluster into at least one grid per
    # surviving table (tables whose random-weight boxes were too small
    # for 4x4 cells are demoted to paragraphs — role split invariant)
    for table in semantic.tables:
        roles = {c.role for c in table.cells.values()}
        assert roles <= {"header", "cell", "empty", "group", "hole"}
        assert len(table.grids) >= 1
        for grid in table.grids:
            assert len(grid.data) >= 2 and len(grid.data[0]) >= 2


def test_semantic_ids_are_canonical(analyzed):
    *_, semantic, parser = analyzed
    for i, table in enumerate(semantic.tables):
        assert table.id == f"t{i}"
        for gi, grid in enumerate(table.grids):
            assert grid.id == f"g{gi}"
    for pi, p in enumerate(semantic.paragraphs):
        assert p.id == f"p{pi}"


def test_batch_matches_single(analyzed):
    img, quads, paragraphs, tables, semantic, parser = analyzed
    outs = parser.batch([img] * 2)
    assert len(outs) == 2
    for out, _, _ in outs:
        assert out.model_dump() == semantic.model_dump()
