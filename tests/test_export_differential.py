"""Differential tests of the export layer against the REAL reference
implementation (/root/reference/src/yomitoku/export/*), loaded with its
relative-import deps mounted (tests/torch_ref/load_reference.py) — not a
re-typed mirror.

The exporters are duck-typed over schema attributes, so the same
yomitoku_tpu schema objects feed both implementations and the emitted
markdown / HTML / CSV strings must match byte-for-byte (figure export
off: the reference writes crops through its own save_image path)."""

import random

import pytest

from yomitoku_tpu.export.export_csv import convert_csv as ours_csv
from yomitoku_tpu.export.export_html import convert_html as ours_html
from yomitoku_tpu.export.export_markdown import convert_markdown as ours_md
from yomitoku_tpu.schemas import (
    DocumentAnalyzerSchema,
    Element,
    ParagraphSchema,
    TableCellSchema,
    TableLineSchema,
    TableStructureRecognizerSchema,
    WordPrediction,
)

_MISC = "/root/reference/src/yomitoku/utils/misc.py"


# The reference export modules do `from ..utils.misc import save_image`;
# mount a synthetic parent package so the relative import resolves.
def _load(name):
    import importlib.util
    import sys
    import types

    mod_key = f"ref_export_{name}"
    if mod_key in sys.modules:
        return sys.modules[mod_key]
    # parent package with utils subpackage providing misc
    pkg = types.ModuleType(mod_key + "_pkg")
    pkg.__path__ = ["/root/reference/src/yomitoku"]
    sys.modules[mod_key + "_pkg"] = pkg
    utils_pkg = types.ModuleType(mod_key + "_pkg.utils")
    utils_pkg.__path__ = ["/root/reference/src/yomitoku/utils"]
    sys.modules[mod_key + "_pkg.utils"] = utils_pkg
    spec = importlib.util.spec_from_file_location(
        mod_key + "_pkg.utils.misc", _MISC
    )
    misc = importlib.util.module_from_spec(spec)
    sys.modules[mod_key + "_pkg.utils.misc"] = misc
    spec.loader.exec_module(misc)
    spec = importlib.util.spec_from_file_location(
        mod_key + "_pkg.export_mod",
        f"/root/reference/src/yomitoku/export/{name}.py",
    )
    mod = importlib.util.module_from_spec(spec)
    # relative ..utils.misc resolves against mod_key_pkg
    mod.__package__ = mod_key + "_pkg.sub"
    sub = types.ModuleType(mod_key + "_pkg.sub")
    sub.__path__ = ["/root/reference/src/yomitoku/export"]
    sys.modules[mod_key + "_pkg.sub"] = sub
    sys.modules[mod_key + "_pkg.sub.export_mod"] = mod
    spec.loader.exec_module(mod)
    sys.modules[mod_key] = mod
    return mod


def _word(content, box, direction="horizontal"):
    x0, y0, x1, y1 = box
    return WordPrediction(
        points=[[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
        content=content,
        direction=direction,
        det_score=0.9,
        rec_score=0.9,
    )


def _results():
    """Document with escaping hazards: markdown specials, HTML specials,
    URLs, line breaks, span cells, section headings, empty cells."""
    texts = [
        "plain text",
        "md specials: *bold* _u_ [link](x) #h + | - ~ ` { } !",
        "html specials: <tag> & \"quot\" 'apos'",
        "url: https://example.com/a?b=c&d=e stays",
        "line\nbreak",
        "日本語テキスト、句読点。",
        "",
    ]
    paragraphs = [
        ParagraphSchema(
            box=[10, 10 + 30 * i, 300, 34 + 30 * i],
            contents=t,
            direction="horizontal",
            order=i + 1,
            role="section_headings" if i == 1 else None,
        )
        for i, t in enumerate(texts)
    ]
    cells = []
    rng = random.Random(0)
    for r in range(1, 4):
        for c in range(1, 4):
            if (r, c) == (2, 2):
                continue  # absorbed by the span below
            rs = 2 if (r, c) == (2, 1) else 1
            cells.append(
                TableCellSchema(
                    row=r, col=c, row_span=rs, col_span=1,
                    box=[c * 50, 200 + r * 30, c * 50 + 48, 228 + r * 30],
                    contents=rng.choice(texts),
                )
            )
    table = TableStructureRecognizerSchema(
        box=[40, 220, 220, 320], n_row=3, n_col=3,
        rows=[TableLineSchema(box=[40, 220, 220, 250], score=0.9)],
        cols=[TableLineSchema(box=[40, 220, 100, 320], score=0.9)],
        spans=[], cells=cells, order=len(paragraphs) + 1,
    )
    return DocumentAnalyzerSchema(
        paragraphs=paragraphs,
        tables=[table],
        figures=[],
        words=[_word(t or "x", [10, 10, 50, 30]) for t in texts],
    )


@pytest.mark.parametrize("ignore_line_break", [False, True])
def test_markdown_differential(ignore_line_break):
    ref = _load("export_markdown")
    results = _results()
    ref_md, _ = ref.convert_markdown(
        results, "/tmp/ref.md",
        ignore_line_break=ignore_line_break, export_figure=False,
    )
    our_md, _ = ours_md(
        results, "/tmp/our.md",
        ignore_line_break=ignore_line_break, export_figure=False,
    )
    assert our_md == ref_md


@pytest.mark.parametrize("ignore_line_break", [False, True])
def test_html_differential(ignore_line_break):
    ref = _load("export_html")
    results = _results()
    ref_html, _ = ref.convert_html(
        results, "/tmp/ref.html",
        ignore_line_break=ignore_line_break, export_figure=False,
        export_figure_letter=False,
    )
    our_html, _ = ours_html(
        results, "/tmp/our.html",
        ignore_line_break=ignore_line_break, export_figure=False,
        export_figure_letter=False,
    )
    assert our_html == ref_html


@pytest.mark.parametrize("ignore_line_break", [False, True])
def test_csv_differential(ignore_line_break):
    ref = _load("export_csv")
    results = _results()
    ref_rows = ref.convert_csv(
        results, "/tmp/ref.csv",
        ignore_line_break=ignore_line_break, export_figure=False,
    )
    our_rows = ours_csv(
        results, "/tmp/our.csv",
        ignore_line_break=ignore_line_break, export_figure=False,
    )
    assert our_rows == ref_rows


def test_html_differential_table_starting_below_row1():
    """A table whose first cell sits below row 1 (possible after span
    filtering or with user-built schemas) must emit the reference's
    leading empty <tr></tr> (its row accumulator starts at pre_row=1)."""
    ref = _load("export_html")
    cells = [
        TableCellSchema(
            row=r, col=1, row_span=1, col_span=1,
            box=[50, 200 + r * 30, 98, 228 + r * 30], contents=f"c{r}",
        )
        for r in (2, 3)
    ]
    table = TableStructureRecognizerSchema(
        box=[40, 220, 220, 320], n_row=3, n_col=1,
        rows=[TableLineSchema(box=[40, 220, 220, 250], score=0.9)],
        cols=[TableLineSchema(box=[40, 220, 100, 320], score=0.9)],
        spans=[], cells=cells, order=1,
    )
    results = DocumentAnalyzerSchema(
        paragraphs=[], tables=[table], figures=[], words=[]
    )
    ref_html, _ = ref.convert_html(
        results, "/tmp/ref.html", ignore_line_break=False,
        export_figure=False, export_figure_letter=False,
    )
    our_html, _ = ours_html(
        results, "/tmp/our.html", ignore_line_break=False,
        export_figure=False, export_figure_letter=False,
    )
    assert "<tr/>" in our_html  # the prettifier self-closes the empty row
    assert our_html == ref_html
