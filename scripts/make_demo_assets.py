"""Generate the committed demo assets under demo/.

Draws two synthetic Japanese document pages (a report page and an
invoice with a table) with the bundled MPLUS1p font, saves them as PNGs,
and wraps both into demo/sample.pdf via the own PDF writer
(utils/searchable_pdf.create_searchable_pdf with empty text layers).
The PDF is verified to round-trip through the own renderer
(data.load_pdf) before being written.

Run from the repo root:  python scripts/make_demo_assets.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image, ImageDraw, ImageFont

FONT = "yomitoku_tpu/resource/MPLUS1p-Medium.ttf"
OUT = "demo"

REPORT_TITLE = "桜市環境白書 2026年版"
REPORT_BODY = [
    "第1章 はじめに",
    "本書は、桜市における環境保全の取り組みと現状を",
    "市民の皆様に分かりやすくお伝えするために作成した",
    "年次報告書です。大気、水質、廃棄物、緑化の各分野",
    "について、測定データと施策の進捗をまとめています。",
    "",
    "第2章 大気環境",
    "市内5地点で実施した大気測定の結果、二酸化窒素の",
    "年平均値はすべての地点で環境基準を達成しました。",
    "微小粒子状物質についても、前年に比べ改善傾向が",
    "続いています。引き続き幹線道路沿いの監視を強化し、",
    "事業者への低公害車導入支援を進めます。",
    "",
    "第3章 水環境",
    "桜川の水質調査では、生物化学的酸素要求量が基準値を",
    "下回り、アユの遡上が3年連続で確認されました。",
    "下水道普及率は98.2%に達し、合併処理浄化槽への",
    "転換補助も継続しています。",
]

INVOICE_TITLE = "請 求 書"
INVOICE_META = [
    ("請求書番号", "INV-2026-0817"),
    ("発行日", "2026年8月17日"),
    ("支払期限", "2026年9月30日"),
]
INVOICE_TO = "株式会社山田商事 御中"
INVOICE_FROM = ["桜葉電機株式会社", "東京都千代田区丸の内1-2-3", "TEL 03-1234-5678"]
TABLE_HEAD = ["品目", "数量", "単価", "金額"]
TABLE_ROWS = [
    ["ノートパソコン SB-14", "2", "128,000", "256,000"],
    ["モニター 27インチ", "4", "32,500", "130,000"],
    ["ドッキングステーション", "2", "18,900", "37,800"],
    ["保守サポート(年間)", "1", "45,000", "45,000"],
]
TABLE_FOOT = [["小計", "468,800"], ["消費税(10%)", "46,880"], ["合計", "515,680"]]


def draw_report():
    img = Image.new("RGB", (960, 1280), "white")
    d = ImageDraw.Draw(img)
    title_f = ImageFont.truetype(FONT, 36)
    body_f = ImageFont.truetype(FONT, 22)
    head_f = ImageFont.truetype(FONT, 26)
    d.text((80, 70), REPORT_TITLE, font=title_f, fill="black")
    d.line([(80, 130), (880, 130)], fill="black", width=3)
    y = 180
    for line in REPORT_BODY:
        if not line:
            y += 18
            continue
        f = head_f if line.startswith("第") else body_f
        d.text((80 if line.startswith("第") else 110, y), line, font=f,
               fill="black")
        y += 44 if line.startswith("第") else 36
    d.text((420, 1210), "- 1 -", font=body_f, fill="black")
    return img


def draw_invoice():
    img = Image.new("RGB", (960, 1280), "white")
    d = ImageDraw.Draw(img)
    title_f = ImageFont.truetype(FONT, 40)
    body_f = ImageFont.truetype(FONT, 22)
    small_f = ImageFont.truetype(FONT, 19)
    d.text((390, 60), INVOICE_TITLE, font=title_f, fill="black")
    d.text((80, 160), INVOICE_TO, font=ImageFont.truetype(FONT, 27),
           fill="black")
    d.line([(80, 200), (460, 200)], fill="black", width=2)
    for i, line in enumerate(INVOICE_FROM):
        d.text((600, 150 + 30 * i), line, font=small_f, fill="black")
    for i, (k, v) in enumerate(INVOICE_META):
        d.text((600, 260 + 32 * i), f"{k}  {v}", font=small_f, fill="black")
    d.text((80, 280), "下記の通りご請求申し上げます。", font=body_f, fill="black")

    # table: header + item rows + footer block
    x0, y0, x1 = 80, 400, 880
    cols = [x0, 480, 580, 720, x1]
    rh = 52
    rows = [y0 + i * rh for i in range(len(TABLE_ROWS) + 2)]
    for y in rows:
        d.line([(x0, y), (x1, y)], fill="black", width=2)
    for x in cols:
        d.line([(x, rows[0]), (x, rows[-1])], fill="black", width=2)
    for j, h in enumerate(TABLE_HEAD):
        cx = (cols[j] + cols[j + 1]) // 2
        d.text((cx, rows[0] + rh // 2), h, font=body_f, fill="black",
               anchor="mm")
    for i, row in enumerate(TABLE_ROWS):
        y = rows[i + 1] + rh // 2
        d.text((cols[0] + 12, y), row[0], font=small_f, fill="black",
               anchor="lm")
        for j, v in enumerate(row[1:], start=1):
            d.text((cols[j + 1] - 12, y), v, font=small_f, fill="black",
                   anchor="rm")
    fy = rows[-1] + 30
    for i, (k, v) in enumerate(TABLE_FOOT):
        y = fy + i * 46
        d.line([(580, y + 36), (880, y + 36)], fill="black", width=1)
        d.text((600, y), k, font=body_f, fill="black")
        d.text((870, y), v, font=body_f, fill="black", anchor="ra")
    d.text((80, 1150), "お振込先: さくら銀行 本店 普通 1234567",
           font=small_f, fill="black")
    d.text((80, 1185), "恐れ入りますが振込手数料は貴社にてご負担願います。",
           font=small_f, fill="black")
    return img


def make_scan_pdf(img, out_path):
    """A fax-style scan of ``img``: bitonal CCITT Group-4 image stream in
    a minimal PDF — the scanned-document input class the native fax
    decoder (native/ccitt.cpp) handles, as pdfium does for the
    reference."""
    import io

    from PIL import Image

    arr = np.asarray(img.convert("L"))
    black = arr < 160
    h, w = black.shape
    buf = io.BytesIO()
    Image.fromarray(black.astype(np.uint8) * 255).convert("1").save(
        buf, format="TIFF", compression="group4", tiffinfo={278: h}
    )
    data = buf.getvalue()
    im = Image.open(io.BytesIO(data))
    offs, counts = im.tag_v2[273], im.tag_v2[279]
    assert len(offs) == 1, "expected a single G4 strip"
    g4 = data[offs[0] : offs[0] + counts[0]]

    img_dict = (
        f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
        f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        f"/Filter /CCITTFaxDecode "
        f"/DecodeParms << /K -1 /Columns {w} /Rows {h} >> "
        f"/Length {len(g4)} >>"
    )
    content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            f"/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>"
        ).encode(),
        img_dict.encode() + b"\nstream\n" + g4 + b"\nendstream",
        f"<< /Length {len(content)} >>".encode()
        + b"\nstream\n" + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref}\n%%EOF\n"
    ).encode()
    with open(out_path, "wb") as f:
        f.write(bytes(out))


def main():
    os.makedirs(OUT, exist_ok=True)
    report, invoice = draw_report(), draw_invoice()
    report.save(f"{OUT}/sample_text.png")
    invoice.save(f"{OUT}/sample_table.png")
    make_scan_pdf(report, f"{OUT}/sample_scan.pdf")

    from yomitoku_tpu.schemas import DocumentAnalyzerSchema
    from yomitoku_tpu.utils.searchable_pdf import create_searchable_pdf

    empty = DocumentAnalyzerSchema(paragraphs=[], tables=[], figures=[],
                                   words=[])
    create_searchable_pdf(
        [report, invoice], [empty, empty], f"{OUT}/sample.pdf",
        image_quality="middle",
    )

    # verify the PDF round-trips through the own renderer
    from yomitoku_tpu.data import load_pdf

    pages = load_pdf(f"{OUT}/sample.pdf")
    arrs = [np.asarray(p) for p in pages]
    assert len(arrs) == 2 and all(a.ndim == 3 for a in arrs), "render failed"
    scan = load_pdf(f"{OUT}/sample_scan.pdf")
    sarr = np.asarray(scan[0])
    assert sarr.ndim == 3 and (sarr.mean(axis=2) < 128).sum() > 1000, (
        "scan render failed"
    )
    print("demo assets written:",
          sorted(os.listdir(OUT)), "pdf pages:",
          [a.shape for a in arrs] + [sarr.shape])


if __name__ == "__main__":
    main()
