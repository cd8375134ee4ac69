"""HTML exporter.

Reference parity: yomitoku/export/export_html.py — escaped contents,
``<table border="1">`` with row/colspan, ``<h1>`` section headings, lxml
pretty-printing of the final document fragment.
"""

import re
from html import escape

from lxml import etree, html as lxml_html

from .figures import crop_figures

_URL_RE = re.compile(r"https?://[^\s<>]")


def convert_text_to_html(text):
    """HTML-escape text (URLs kept as plain escaped text, not linkified)."""
    return _URL_RE.sub(lambda m: escape(m.group(0)), escape(text))


def add_td_tag(contents, row_span, col_span):
    return f'<td rowspan="{row_span}" colspan="{col_span}">{contents}</td>'


def add_table_tag(contents):
    return f'<table border="1" style="border-collapse: collapse">{contents}</table>'


def add_tr_tag(contents):
    return f"<tr>{contents}</tr>"


def add_p_tag(contents):
    return f"<p>{contents}</p>"


def add_h1_tag(contents):
    return f"<h1>{contents}</h1>"


def add_html_tag(text):
    return f"<html><body>{text}</body></html>"


def _finalize(contents, ignore_line_break):
    if ignore_line_break:
        return contents.replace("\n", "")
    return contents.replace("\n", "<br>")


def table_to_html(table, ignore_line_break):
    pre_row = 1
    rows = []
    row = []
    for cell in table.cells:
        if cell.row != pre_row:
            rows.append(add_tr_tag("".join(row)))
            row = []
        contents = cell.contents if cell.contents is not None else ""
        contents = _finalize(convert_text_to_html(contents), ignore_line_break)
        row.append(add_td_tag(contents, cell.row_span, cell.col_span))
        pre_row = cell.row
    rows.append(add_tr_tag("".join(row)))
    return {
        "box": table.box,
        "order": table.order,
        "html": add_table_tag("".join(rows)),
    }


def paragraph_to_html(paragraph, ignore_line_break):
    contents = _finalize(
        convert_text_to_html(paragraph.contents), ignore_line_break
    )
    if paragraph.role == "section_headings":
        contents = add_h1_tag(contents)
    return {
        "box": paragraph.box,
        "order": paragraph.order,
        "html": add_p_tag(contents),
    }


def figure_to_html(
    figures,
    img,
    out_path,
    export_figure_letter=False,
    ignore_line_break=False,
    figure_dir="figures",
    width=200,
):
    elements = []
    paths = crop_figures(figures, img, out_path, figure_dir=figure_dir)
    for figure, rel_path in zip(figures, paths):
        elements.append(
            {
                "order": figure.order,
                "html": f'<img src="{rel_path}" width="{width}"><br>',
            }
        )
        if export_figure_letter:
            for paragraph in sorted(figure.paragraphs, key=lambda x: x.order):
                contents = paragraph_to_html(paragraph, ignore_line_break)
                elements.append({"order": figure.order, "html": contents["html"]})
    return elements


def convert_html(
    inputs,
    out_path,
    ignore_line_break,
    export_figure,
    export_figure_letter,
    img=None,
    figure_width=200,
    figure_dir="figures",
):
    elements = []
    for table in inputs.tables:
        elements.append(table_to_html(table, ignore_line_break))
    for paragraph in inputs.paragraphs:
        elements.append(paragraph_to_html(paragraph, ignore_line_break))
    if export_figure:
        elements.extend(
            figure_to_html(
                inputs.figures,
                img,
                out_path,
                export_figure_letter,
                ignore_line_break,
                width=figure_width,
                figure_dir=figure_dir,
            ),
        )
    elements = sorted(elements, key=lambda x: x["order"])

    html_string = "".join([element["html"] for element in elements])
    if len(html_string) != 0:
        parsed = lxml_html.fromstring(html_string)
        formatted_html = etree.tostring(parsed, pretty_print=True, encoding="unicode")
    else:
        formatted_html = ""
    return formatted_html, elements


def export_html(
    inputs,
    out_path: str,
    ignore_line_break: bool = False,
    export_figure: bool = True,
    export_figure_letter: bool = False,
    img=None,
    figure_width=200,
    figure_dir="figures",
    encoding: str = "utf-8",
):
    formatted_html, _ = convert_html(
        inputs,
        out_path,
        ignore_line_break,
        export_figure,
        export_figure_letter,
        img,
        figure_width,
        figure_dir,
    )
    save_html(formatted_html, out_path, encoding)
    return formatted_html


def save_html(html, out_path, encoding):
    with open(out_path, "w", encoding=encoding, errors="ignore") as f:
        f.write(html)
