"""mkdocs-macros module: render generated JSON Schemas as doc cards.

Capability parity with the reference's docs tooling (its ``macros/``
package renders ``schemas/*.json`` into HTML schema cards for the
mkdocs-material site); this is an independent, compact implementation.

Usage in a docs page (mkdocs-macros plugin, ``module_name: macros``)::

    {{ schema_card("DocumentAnalyzerSchema") }}

Works standalone too (tests / previews): ``render_schema_card(name)``
returns the HTML string.
"""

from .schema_cards import define_env, render_schema_card

__all__ = ["define_env", "render_schema_card"]
