"""Differential fuzz of the DocumentAnalyzer aggregation helpers against
the REAL reference implementation (yomitoku/document_analyzer.py):
page-direction vote, figure absorption, ruby filtering (histogram valley
split + MAD fallback), word->element assignment, quad splitting at table
cell boundaries, and the full aggregate() method.

Each side builds its own schema objects from a shared random spec (the
reference mutates cell contents in place), and outputs are compared as
plain structures.
"""

import math
from types import SimpleNamespace

import numpy as np
import pytest

import yomitoku_tpu.document_analyzer as ours
from yomitoku_tpu.schemas import (
    Element,
    LayoutAnalyzerSchema,
    ParagraphSchema,
    TableCellSchema,
    TableLineSchema,
    TableStructureRecognizerSchema,
    TextDetectorSchema,
    WordPrediction,
)

from tests.torch_ref.load_reference import load_reference_document_analyzer

REF = load_reference_document_analyzer()
REF_SCHEMAS = __import__("sys").modules["ref_docan.schemas.document_analyzer"]

KANA = "あいうえおカキクケコはひふへほラリルレロ"
OTHER = "漢字text123、。・ABC"


def _rand_text(rng, kana_only_p=0.5):
    pool = KANA if rng.rand() < kana_only_p else KANA + OTHER
    n = rng.randint(1, 8)
    s = "".join(pool[rng.randint(len(pool))] for _ in range(n))
    if rng.rand() < 0.2:
        s = s[: max(1, n // 2)] + " " + s[n // 2 :]
    return s


def _rand_words(rng, n, big=28, small=9):
    """Axis-aligned word quads with a bimodal size mix (body + ruby)."""
    words = []
    for _ in range(n):
        h = small if rng.rand() < 0.35 else big
        h = max(1, int(h * rng.uniform(0.7, 1.3)))
        w = int(h * rng.uniform(1, 8))
        x, y = rng.randint(0, 800), rng.randint(0, 1000)
        quad = [[x, y], [x + w, y], [x + w, y + h], [x, y + h]]
        if rng.rand() < 0.15:  # tall quad -> vertical aspect
            quad = [[x, y], [x + h, y], [x + h, y + w], [x, y + w]]
        words.append(
            {
                "points": quad,
                "content": _rand_text(rng),
                "direction": "vertical" if rng.rand() < 0.3 else "horizontal",
                "det_score": float(rng.rand()),
                "rec_score": float(rng.rand()),
            }
        )
    return words


def _rand_table_spec(rng, x0, y0, nr=None, nc=None):
    nr = nr or rng.randint(2, 5)
    nc = nc or rng.randint(2, 5)
    ch, cw = rng.randint(24, 60), rng.randint(60, 160)
    x1, y1 = x0 + nc * cw, y0 + nr * ch
    cells = [
        {
            "row": r + 1, "col": c + 1, "row_span": 1, "col_span": 1,
            "box": [x0 + c * cw, y0 + r * ch, x0 + (c + 1) * cw, y0 + (r + 1) * ch],
            "contents": None,
        }
        for r in range(nr) for c in range(nc)
    ]
    if rng.rand() < 0.4 and nr > 2:  # one row-span cell
        cells[0]["row_span"] = 2
    return {
        "box": [x0, y0, x1, y1], "n_row": nr, "n_col": nc, "order": 0,
        "rows": [
            {"box": [x0, y0 + r * ch, x1, y0 + (r + 1) * ch], "score": 0.9}
            for r in range(nr)
        ],
        "cols": [
            {"box": [x0 + c * cw, y0, x0 + (c + 1) * cw, y1], "score": 0.9}
            for c in range(nc)
        ],
        "spans": [],
        "cells": cells,
    }


def _build_table(spec, schemas):
    return schemas.TableStructureRecognizerSchema(
        box=spec["box"], n_row=spec["n_row"], n_col=spec["n_col"],
        order=spec["order"],
        rows=[schemas.TableLineSchema(**r) for r in spec["rows"]],
        cols=[schemas.TableLineSchema(**c) for c in spec["cols"]],
        spans=[schemas.TableLineSchema(**s) for s in spec["spans"]],
        cells=[schemas.TableCellSchema(**c) for c in spec["cells"]],
    )


OUR_SCHEMAS = SimpleNamespace(
    TableStructureRecognizerSchema=TableStructureRecognizerSchema,
    TableLineSchema=TableLineSchema,
    TableCellSchema=TableCellSchema,
)


def _para_dump(p):
    return [list(p.box), p.contents, p.direction, p.order, p.role]


def test_judge_page_direction_differential():
    rng = np.random.RandomState(11)
    for _ in range(200):
        n = rng.randint(0, 12)
        paras = []
        for _ in range(n):
            x, y = rng.randint(0, 500, 2)
            w, h = rng.randint(0, 200, 2)  # zero-area allowed
            paras.append(
                SimpleNamespace(
                    box=[x, y, x + w, y + h],
                    direction="vertical" if rng.rand() < 0.5 else "horizontal",
                )
            )
        assert ours.judge_page_direction(paras) == REF.judge_page_direction(paras)


def test_ruby_threshold_differential():
    rng = np.random.RandomState(7)
    for trial in range(400):
        n = rng.randint(1, 40)
        mode = trial % 4
        if mode == 0:  # strongly bimodal
            sizes = np.concatenate(
                [rng.uniform(25, 32, n), rng.uniform(7, 9, max(2, n // 3))]
            )
        elif mode == 1:  # unimodal
            sizes = rng.uniform(20, 30, n)
        elif mode == 2:  # constant (zero spread / MAD zero)
            sizes = np.full(n, float(rng.randint(5, 30)))
        else:  # wide spread
            sizes = rng.uniform(1, 200, n)
        sizes = [float(s) for s in sizes]
        k = float(rng.choice([1.0, 2.0, 3.0]))
        a = ours._compute_ruby_threshold(sizes, k)
        b = REF._compute_ruby_threshold(sizes, k)
        if a is None or b is None:
            assert a == b, (trial, sizes, k)
        else:
            assert math.isclose(a, b, rel_tol=1e-12), (trial, sizes, k)


def test_filter_ruby_differential():
    rng = np.random.RandomState(13)
    for _ in range(200)    :
        words = [
            SimpleNamespace(
                box=[0, 0, int(w), int(h)], contents=_rand_text(rng)
            )
            for w, h in zip(
                rng.randint(0, 250, size=rng.randint(1, 30)),
                rng.randint(0, 40, size=30),
            )
        ]
        k = float(rng.choice([1.5, 2.0, 2.5]))
        a = ours.filter_ruby(list(words), "horizontal", k)
        b = REF.filter_ruby(list(words), "horizontal", k)
        assert [w.contents for w in a] == [w.contents for w in b]


def _words_both(spec):
    return (
        [WordPrediction(**w) for w in spec],
        [SimpleNamespace(**w) for w in spec],
    )


@pytest.mark.parametrize("ignore_ruby", [False, True])
def test_extract_words_within_element_differential(ignore_ruby):
    rng = np.random.RandomState(17 + ignore_ruby)
    for _ in range(60):
        spec = _rand_words(rng, rng.randint(1, 25))
        ours_words, ref_words = _words_both(spec)
        x, y = rng.randint(0, 400, 2)
        el_box = [x, y, x + rng.randint(100, 600), y + rng.randint(100, 600)]
        our_el = SimpleNamespace(box=el_box)
        a_text, a_dir, a_flags = ours.extract_words_within_element(
            ours_words, our_el, ignore_ruby=ignore_ruby, ruby_threshold=2.0
        )
        b_text, b_dir, b_flags = REF.extract_words_within_element(
            ref_words, SimpleNamespace(box=el_box),
            ignore_ruby=ignore_ruby, ruby_threshold=2.0,
        )
        assert (a_text, a_dir, a_flags) == (b_text, b_dir, b_flags)


def test_extract_paragraph_within_figure_differential():
    rng = np.random.RandomState(23)
    for _ in range(80):
        paras = []
        for _ in range(rng.randint(0, 15)):
            x, y = rng.randint(0, 700, 2)
            w, h = rng.randint(10, 200, 2)
            paras.append(
                {
                    "box": [x, y, x + w, y + h],
                    "contents": _rand_text(rng),
                    "direction": "vertical" if rng.rand() < 0.4 else "horizontal",
                    "order": 0, "role": None,
                }
            )
        figs = []
        for _ in range(rng.randint(0, 4)):
            x, y = rng.randint(0, 500, 2)
            figs.append([x, y, x + rng.randint(50, 500), y + rng.randint(50, 500)])

        a_figs, a_check = ours.extract_paragraph_within_figure(
            [ParagraphSchema(**p) for p in paras],
            [SimpleNamespace(box=b) for b in figs],
        )
        b_figs, b_check = REF.extract_paragraph_within_figure(
            [REF_SCHEMAS.ParagraphSchema(**p) for p in paras],
            [SimpleNamespace(box=b) for b in figs],
        )
        assert a_check == b_check
        assert len(a_figs) == len(b_figs)
        for fa, fb in zip(a_figs, b_figs):
            assert list(fa.box) == list(fb.box)
            assert fa.direction == fb.direction
            assert [_para_dump(p) for p in fa.paragraphs] == [
                _para_dump(p) for p in fb.paragraphs
            ]


def test_split_text_across_cells_differential():
    rng = np.random.RandomState(29)
    for _ in range(60):
        tspecs = []
        for i in range(rng.randint(0, 3)):
            tspecs.append(_rand_table_spec(rng, 30 + 350 * i, rng.randint(0, 300)))
        word_spec = _rand_words(rng, rng.randint(0, 30), big=20)
        # bias some words into the tables so splitting actually triggers
        for spec in tspecs:
            x0, y0, x1, y1 = spec["box"]
            for _ in range(rng.randint(0, 8)):
                y = rng.randint(y0, max(y0 + 1, y1 - 12))
                xa = rng.randint(x0, max(x0 + 1, x1 - 40))
                xb = min(x1 + rng.randint(-20, 60), xa + rng.randint(30, 400))
                h = rng.randint(8, 30)
                word_spec.append(
                    {
                        "points": [[xa, y], [xb, y], [xb, y + h], [xa, y + h]],
                        "content": _rand_text(rng),
                        "direction": "horizontal",
                        "det_score": 0.9, "rec_score": 0.9,
                    }
                )

        points = [w["points"] for w in word_spec]
        scores = [w["det_score"] for w in word_spec]
        a = ours._split_text_across_cells(
            TextDetectorSchema(points=list(points), scores=list(scores)),
            SimpleNamespace(tables=[_build_table(s, OUR_SCHEMAS) for s in tspecs]),
        )
        b = REF._split_text_across_cells(
            SimpleNamespace(points=[list(map(list, p)) for p in points],
                            scores=list(scores)),
            SimpleNamespace(tables=[_build_table(s, REF_SCHEMAS) for s in tspecs]),
        )
        a_pts = [np.asarray(p, float).tolist() for p in a.points]
        b_pts = [np.asarray(p, float).tolist() for p in b.points]
        assert a_pts == b_pts
        assert list(a.scores) == list(b.scores)


def _bare(cls, **attrs):
    inst = object.__new__(cls)
    for k, v in attrs.items():
        setattr(inst, k, v)
    return inst


@pytest.mark.parametrize("ignore_ruby,ignore_meta,order", [
    (False, False, "auto"),
    (True, False, "auto"),
    (False, True, "top2bottom"),
    (True, True, "auto"),
])
def test_aggregate_differential(ignore_ruby, ignore_meta, order):
    rng = np.random.RandomState(31 + ignore_ruby + 2 * ignore_meta)
    roles = [None, None, "section_headings", "page_header", "page_footer"]
    for _ in range(25):
        word_spec = _rand_words(rng, rng.randint(0, 40))
        tspecs = [
            _rand_table_spec(rng, 30 + 400 * i, 600 + rng.randint(0, 200))
            for i in range(rng.randint(0, 3))
        ]
        para_spec = []
        for _ in range(rng.randint(0, 8)):
            x, y = rng.randint(0, 600, 2)
            para_spec.append(
                {
                    "box": [x, y, x + rng.randint(50, 400), y + rng.randint(20, 300)],
                    "role": roles[rng.randint(len(roles))],
                }
            )
        fig_spec = []
        for _ in range(rng.randint(0, 3)):
            x, y = rng.randint(0, 500, 2)
            fig_spec.append([x, y, x + rng.randint(80, 500), y + rng.randint(80, 500)])

        def _layout(schemas, element_cls):
            return SimpleNamespace(
                tables=[_build_table(s, schemas) for s in tspecs],
                paragraphs=[
                    element_cls(box=p["box"], role=p["role"]) for p in para_spec
                ],
                figures=[element_cls(box=b, role=None) for b in fig_spec],
            )

        def _element(box, role):
            return SimpleNamespace(box=box, role=role)

        ours_words, ref_words = _words_both(word_spec)
        a_inst = _bare(
            ours.DocumentAnalyzer, ignore_meta=ignore_meta,
            reading_order=order, ignore_ruby=ignore_ruby, ruby_threshold=2.0,
        )
        b_inst = _bare(
            REF.DocumentAnalyzer, ignore_meta=ignore_meta, img=None,
            reading_order=order, ignore_ruby=ignore_ruby, ruby_threshold=2.0,
        )
        a = a_inst.aggregate(
            SimpleNamespace(words=ours_words),
            _layout(OUR_SCHEMAS, _element),
        )
        b = b_inst.aggregate(
            SimpleNamespace(words=ref_words),
            _layout(REF_SCHEMAS, _element),
        )
        assert [_para_dump(p) for p in a["paragraphs"]] == [
            _para_dump(p) for p in b["paragraphs"]
        ]
        for ta, tb in zip(a["tables"], b["tables"]):
            assert ta.order == tb.order
            assert [c.contents for c in ta.cells] == [c.contents for c in tb.cells]
        for fa, fb in zip(a["figures"], b["figures"]):
            assert (list(fa.box), fa.order) == (list(fb.box), fb.order)
