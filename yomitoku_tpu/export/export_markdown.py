"""Markdown exporter.

Reference parity: yomitoku/export/export_markdown.py — escapes markdown
specials, ``#`` for section headings, ``<br>`` (or strip) for line breaks,
tables as pipe grids with a dash separator after the first row, figure
crops saved as PNG with optional in-figure text.
"""

import re

from .figures import crop_figures

_SPECIAL_CHARS = re.compile(r"([`*{}[\]()#+!~|-])")


def escape_markdown_special_chars(text):
    return _SPECIAL_CHARS.sub(r"\\\1", text)


def _finalize(contents, ignore_line_break):
    if ignore_line_break:
        return contents.replace("\n", "")
    return contents.replace("\n", "<br>")


def paragraph_to_md(paragraph, ignore_line_break):
    contents = escape_markdown_special_chars(paragraph.contents)
    contents = _finalize(contents, ignore_line_break)
    if paragraph.role == "section_headings":
        contents = "# " + contents
    return {
        "order": paragraph.order,
        "box": paragraph.box,
        "md": contents + "\n",
    }


def table_to_md(table, ignore_line_break):
    grid = [["" for _ in range(table.n_col)] for _ in range(table.n_row)]
    for cell in table.cells:
        contents = escape_markdown_special_chars(cell.contents)
        contents = _finalize(contents, ignore_line_break)
        grid[cell.row - 1][cell.col - 1] = contents

    table_md = ""
    for i in range(table.n_row):
        table_md += "|" + "|".join(grid[i]) + "|\n"
        if i == 0:
            table_md += "|" + "|".join(["-"] * table.n_col) + "|\n"
    return {
        "order": table.order,
        "box": table.box,
        "md": table_md,
    }


def figure_to_md(
    figures,
    img,
    out_path,
    export_figure_letter=False,
    ignore_line_break=False,
    width=200,
    figure_dir="figures",
):
    elements = []
    paths = crop_figures(figures, img, out_path, figure_dir=figure_dir)
    for figure, rel_path in zip(figures, paths):
        elements.append(
            {
                "order": figure.order,
                "md": f'<img src="{rel_path}" width="{width}px"><br>',
            }
        )
        if export_figure_letter:
            for paragraph in sorted(figure.paragraphs, key=lambda x: x.order):
                element = paragraph_to_md(paragraph, ignore_line_break)
                elements.append({"order": figure.order, "md": element["md"]})
    return elements


def convert_markdown(
    inputs,
    out_path,
    ignore_line_break=False,
    img=None,
    export_figure_letter=False,
    export_figure=True,
    figure_width=200,
    figure_dir="figures",
):
    elements = []
    for table in inputs.tables:
        elements.append(table_to_md(table, ignore_line_break))
    for paragraph in inputs.paragraphs:
        elements.append(paragraph_to_md(paragraph, ignore_line_break))
    if export_figure:
        elements.extend(
            figure_to_md(
                inputs.figures,
                img,
                out_path,
                export_figure_letter,
                ignore_line_break,
                figure_width,
                figure_dir=figure_dir,
            )
        )
    elements = sorted(elements, key=lambda x: x["order"])
    markdown = "\n".join([element["md"] for element in elements])
    return markdown, elements


def export_markdown(
    inputs,
    out_path: str,
    ignore_line_break: bool = False,
    img=None,
    export_figure_letter=False,
    export_figure=True,
    figure_width=200,
    figure_dir="figures",
    encoding: str = "utf-8",
):
    markdown, _ = convert_markdown(
        inputs,
        out_path,
        ignore_line_break,
        img,
        export_figure_letter,
        export_figure,
        figure_width,
        figure_dir,
    )
    save_markdown(markdown, out_path, encoding)
    return markdown


def save_markdown(markdown, out_path, encoding):
    with open(out_path, "w", encoding=encoding, errors="ignore") as f:
        f.write(markdown)
