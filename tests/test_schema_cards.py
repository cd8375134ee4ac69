"""Docs schema-card renderer (macros/): structural checks over the
generated JSON Schemas."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from macros import render_schema_card  # noqa: E402
from macros.schema_cards import define_env, list_schemas  # noqa: E402


def test_renders_all_generated_schemas():
    names = list_schemas()
    assert "DocumentAnalyzerSchema" in names
    for name in names:
        out = render_schema_card(name)
        assert out.startswith('<div class="schema-card"')
        assert "schema-prop" in out


def test_card_contains_fields_and_nesting():
    out = render_schema_card("DocumentAnalyzerSchema")
    for field in ("paragraphs", "tables", "figures", "words"):
        assert f"<code>{field}</code>" in out
    # nested object (table cells) rendered as a collapsible card
    assert "<details" in out
    assert "row_span" in out


def test_required_and_constraints_render():
    out = render_schema_card("TableCellSchema")
    assert "schema-required" in out
    assert "min items" in out or "max items" in out


def test_define_env_registers_macros():
    registered = {}

    class Env:
        def macro(self, fn):
            registered[fn.__name__] = fn
            return fn

    define_env(Env())
    assert set(registered) == {"schema_card", "schema_index"}
    html = registered["schema_card"]("OCRSchema")
    assert "schema-card" in html
