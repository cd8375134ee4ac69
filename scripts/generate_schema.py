"""Dump JSON Schemas of the public pydantic result models.

Mirror of the reference's docs tooling (scripts/generate_schema.py +
macros/schema_renderer.py in kotaro-kinoshita/yomitoku): each schema's
JSON Schema is written to ``schemas/<Name>.json`` for the docs site and
for consumers that validate exported JSON.

Usage: python scripts/generate_schema.py [outdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yomitoku_tpu.schemas as core
import yomitoku_tpu.schemas.table_semantic_parser as semantic

CORE = [
    "DocumentAnalyzerSchema",
    "OCRSchema",
    "LayoutAnalyzerSchema",
    "LayoutParserSchema",
    "TableStructureRecognizerSchema",
    "TextDetectorSchema",
    "TextRecognizerSchema",
    "WordPrediction",
    "ParagraphSchema",
    "FigureSchema",
    "TableCellSchema",
    "TableLineSchema",
]
SEMANTIC = [
    "TableSemanticParserSchema",
    "TableDetectorSchema",
    "TableGridSchema",
    "TableSemanticContentsSchema",
    "KvItemSchema",
    "CellSchema",
    "TableSemanticContentsTemplateSchema",
]


def main(outdir="schemas"):
    os.makedirs(outdir, exist_ok=True)
    written = []
    for mod, names in ((core, CORE), (semantic, SEMANTIC)):
        for name in names:
            cls = getattr(mod, name, None)
            if cls is None:
                continue
            schema = cls.model_json_schema()
            path = os.path.join(outdir, f"{name}.json")
            with open(path, "w", encoding="utf-8") as f:
                json.dump(schema, f, ensure_ascii=False, indent=2)
            written.append(path)
    print(f"wrote {len(written)} schemas to {outdir}/")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["schemas"]))
