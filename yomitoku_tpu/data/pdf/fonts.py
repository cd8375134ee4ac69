"""Embedded font parsing for the built-in PDF renderer.

Parses the two glyph-program formats that PDF CID fonts embed —
CFF/Type2 charstrings (FontFile3, CIDFontType0 / Type1C) and TrueType
glyf outlines (FontFile2, CIDFontType2) — into vector contours for the
native rasterizer.  The reference gets all of this from pdfium
(data/functions.py:96); no font library exists in this environment.

A glyph path is a list of contours; each contour is a list of path
segments: ("L", (x, y)) line-to, ("C", (c1x, c1y), (c2x, c2y), (x, y))
cubic, ("Q", (cx, cy), (x, y)) quadratic, starting from an implicit
("M", start) stored as contour[0] = ("M", (x, y)).  Coordinates are in
font units (CFF charstring units / TrueType funits).
"""

import struct


# --------------------------------------------------------------------------
# CFF (Compact Font Format) + Type2 charstrings
# --------------------------------------------------------------------------

def _read_index(data, pos):
    """CFF INDEX -> (list of bytes, new_pos)."""
    count = struct.unpack(">H", data[pos : pos + 2])[0]
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    offsets = []
    for i in range(count + 1):
        off = 0
        for b in data[pos + i * off_size : pos + (i + 1) * off_size]:
            off = (off << 8) | b
        offsets.append(off)
    pos += (count + 1) * off_size
    base = pos - 1
    items = [data[base + offsets[i] : base + offsets[i + 1]] for i in range(count)]
    return items, base + offsets[-1]


def _parse_dict(data):
    """CFF DICT bytes -> {op: [operands]} (two-byte ops keyed 1200+x)."""
    out = {}
    operands = []
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b <= 21:
            if b == 12:
                op = 1200 + data[i + 1]
                i += 2
            else:
                op = b
                i += 1
            out[op] = operands
            operands = []
        elif b == 28:
            operands.append(struct.unpack(">h", data[i + 1 : i + 3])[0])
            i += 3
        elif b == 29:
            operands.append(struct.unpack(">i", data[i + 1 : i + 5])[0])
            i += 5
        elif b == 30:  # real number
            s = ""
            i += 1
            done = False
            while i < n and not done:
                byte = data[i]
                i += 1
                for nib in (byte >> 4, byte & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
            try:
                operands.append(float(s) if s else 0.0)
            except ValueError:
                operands.append(0.0)
        elif 32 <= b <= 246:
            operands.append(b - 139)
            i += 1
        elif 247 <= b <= 250:
            operands.append((b - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b <= 254:
            operands.append(-(b - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            i += 1
    return out


def _subr_bias(subrs):
    n = len(subrs)
    if n < 1240:
        return 107
    if n < 33900:
        return 1131
    return 32768


class CFFFont:
    """CFF font: charstrings + (CID) FDArray/FDSelect + charset maps."""

    def __init__(self, data: bytes):
        self.data = data
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        _strings, pos = _read_index(data, pos)
        self.gsubrs, pos = _read_index(data, pos)
        top = _parse_dict(top_dicts[0])
        self.top = top

        cs_off = int(top[17][0])
        self.charstrings, _ = _read_index(data, cs_off)
        self.n_glyphs = len(self.charstrings)

        self.is_cid = 1230 in top  # ROS
        self.font_matrix = top.get(1207, [0.001, 0, 0, 0.001, 0, 0])

        # private dict + local subrs (non-CID)
        self.subrs = []
        self.default_width = 0.0
        self.nominal_width = 0.0
        if 18 in top:
            size, off = int(top[18][0]), int(top[18][1])
            self._load_private(off, size, into_self=True)

        # CID: FDArray / FDSelect give per-glyph private dicts
        self.fd_subrs = None
        self.fd_select = None
        if self.is_cid and 1236 in top:  # FDArray
            fd_dicts, _ = _read_index(data, int(top[1236][0]))
            self.fd_subrs = []
            for fd in fd_dicts:
                d = _parse_dict(fd)
                if 18 in d:
                    size, off = int(d[18][0]), int(d[18][1])
                    self.fd_subrs.append(self._load_private(off, size))
                else:
                    self.fd_subrs.append([])
            if 1237 in top:  # FDSelect
                self.fd_select = self._parse_fd_select(int(top[1237][0]))

        # charset: gid -> CID (CID fonts) or gid -> SID
        self.charset = self._parse_charset(top.get(15, [0])[0])
        self.cid_to_gid = {}
        for gid, cid in enumerate(self.charset):
            self.cid_to_gid.setdefault(cid, gid)

    def _load_private(self, off, size, into_self=False):
        d = _parse_dict(self.data[off : off + size])
        subrs = []
        if 19 in d:
            subrs, _ = _read_index(self.data, off + int(d[19][0]))
        if into_self:
            self.subrs = subrs
            self.default_width = float(d.get(20, [0])[0])
            self.nominal_width = float(d.get(21, [0])[0])
        return subrs

    def _parse_fd_select(self, off):
        data = self.data
        fmt = data[off]
        sel = [0] * self.n_glyphs
        if fmt == 0:
            for gid in range(self.n_glyphs):
                sel[gid] = data[off + 1 + gid]
        elif fmt == 3:
            n_ranges = struct.unpack(">H", data[off + 1 : off + 3])[0]
            p = off + 3
            first = struct.unpack(">H", data[p : p + 2])[0]
            for _ in range(n_ranges):
                fd = data[p + 2]
                nxt = struct.unpack(">H", data[p + 3 : p + 5])[0]
                for gid in range(first, nxt):
                    if gid < self.n_glyphs:
                        sel[gid] = fd
                p += 3
                first = nxt
        return sel

    def _parse_charset(self, off):
        n = self.n_glyphs
        if off == 0:  # ISOAdobe / identity-ish
            return list(range(n))
        off = int(off)
        data = self.data
        fmt = data[off]
        charset = [0]
        p = off + 1
        if fmt == 0:
            for _ in range(n - 1):
                charset.append(struct.unpack(">H", data[p : p + 2])[0])
                p += 2
        elif fmt in (1, 2):
            while len(charset) < n:
                first = struct.unpack(">H", data[p : p + 2])[0]
                if fmt == 1:
                    n_left = data[p + 2]
                    p += 3
                else:
                    n_left = struct.unpack(">H", data[p + 3 : p + 5])[0]
                    p += 4
                for k in range(n_left + 1):
                    if len(charset) < n:
                        charset.append(first + k)
        return charset

    def glyph_path(self, gid):
        """Type2 charstring -> contours (see module docstring)."""
        if gid < 0 or gid >= self.n_glyphs:
            return []
        subrs = self.subrs
        if self.fd_subrs is not None:
            fd = self.fd_select[gid] if self.fd_select else 0
            subrs = self.fd_subrs[fd] if fd < len(self.fd_subrs) else []
        return _run_charstring(
            self.charstrings[gid], subrs, self.gsubrs
        )


def _run_charstring(code, subrs, gsubrs):
    contours = []
    current = []
    x = y = 0.0
    stack = []
    n_stems = 0
    width_parsed = False
    sb = _subr_bias(subrs)
    gb = _subr_bias(gsubrs)

    def moveto(nx, ny):
        nonlocal current
        if current:
            contours.append(current)
        current = [("M", (nx, ny))]

    def lineto(nx, ny):
        current.append(("L", (nx, ny)))

    def curveto(c1x, c1y, c2x, c2y, nx, ny):
        current.append(("C", (c1x, c1y), (c2x, c2y), (nx, ny)))

    def take_width(even_args):
        nonlocal width_parsed
        if not width_parsed:
            width_parsed = True
            if len(stack) % 2 == (1 if even_args else 0):
                # odd arg count when evens expected -> leading width
                del stack[0]

    call_stack = [(code, 0)]
    while call_stack:
        code, i = call_stack.pop()
        n = len(code)
        while i < n:
            b = code[i]
            if b >= 32 or b == 28:
                if b == 28:
                    stack.append(struct.unpack(">h", code[i + 1 : i + 3])[0])
                    i += 3
                elif b <= 246:
                    stack.append(b - 139)
                    i += 1
                elif b <= 250:
                    stack.append((b - 247) * 256 + code[i + 1] + 108)
                    i += 2
                elif b <= 254:
                    stack.append(-(b - 251) * 256 - code[i + 1] - 108)
                    i += 2
                else:  # 255: 16.16 fixed
                    stack.append(
                        struct.unpack(">i", code[i + 1 : i + 5])[0] / 65536.0
                    )
                    i += 5
                continue

            i += 1
            if b in (1, 3, 18, 23):  # h/vstem(hm)
                if not width_parsed and len(stack) % 2 == 1:
                    del stack[0]
                width_parsed = True
                n_stems += len(stack) // 2
                stack.clear()
            elif b in (19, 20):  # hintmask/cntrmask
                if not width_parsed and len(stack) % 2 == 1:
                    del stack[0]
                width_parsed = True
                n_stems += len(stack) // 2
                stack.clear()
                i += (n_stems + 7) // 8
            elif b == 21:  # rmoveto
                take_width(True)
                if len(stack) >= 2:
                    x += stack[-2]
                    y += stack[-1]
                moveto(x, y)
                stack.clear()
            elif b == 22:  # hmoveto
                take_width(False)
                if stack:
                    x += stack[-1]
                moveto(x, y)
                stack.clear()
            elif b == 4:  # vmoveto
                take_width(False)
                if stack:
                    y += stack[-1]
                moveto(x, y)
                stack.clear()
            elif b == 5:  # rlineto
                for k in range(0, len(stack) - 1, 2):
                    x += stack[k]
                    y += stack[k + 1]
                    lineto(x, y)
                stack.clear()
            elif b in (6, 7):  # hlineto / vlineto (alternating)
                horiz = b == 6
                for v in stack:
                    if horiz:
                        x += v
                    else:
                        y += v
                    lineto(x, y)
                    horiz = not horiz
                stack.clear()
            elif b == 8:  # rrcurveto
                for k in range(0, len(stack) - 5, 6):
                    c1x = x + stack[k]
                    c1y = y + stack[k + 1]
                    c2x = c1x + stack[k + 2]
                    c2y = c1y + stack[k + 3]
                    x = c2x + stack[k + 4]
                    y = c2y + stack[k + 5]
                    curveto(c1x, c1y, c2x, c2y, x, y)
                stack.clear()
            elif b == 24:  # rcurveline
                k = 0
                while len(stack) - k >= 8:
                    c1x = x + stack[k]
                    c1y = y + stack[k + 1]
                    c2x = c1x + stack[k + 2]
                    c2y = c1y + stack[k + 3]
                    x = c2x + stack[k + 4]
                    y = c2y + stack[k + 5]
                    curveto(c1x, c1y, c2x, c2y, x, y)
                    k += 6
                x += stack[k]
                y += stack[k + 1]
                lineto(x, y)
                stack.clear()
            elif b == 25:  # rlinecurve
                k = 0
                while len(stack) - k >= 8:
                    x += stack[k]
                    y += stack[k + 1]
                    lineto(x, y)
                    k += 2
                c1x = x + stack[k]
                c1y = y + stack[k + 1]
                c2x = c1x + stack[k + 2]
                c2y = c1y + stack[k + 3]
                x = c2x + stack[k + 4]
                y = c2y + stack[k + 5]
                curveto(c1x, c1y, c2x, c2y, x, y)
                stack.clear()
            elif b in (26, 27):  # vvcurveto / hhcurveto
                k = 0
                d1 = 0.0
                if len(stack) % 4 == 1:
                    d1 = stack[0]
                    k = 1
                while k + 3 < len(stack):
                    if b == 26:  # vv
                        c1x = x + d1
                        c1y = y + stack[k]
                        c2x = c1x + stack[k + 1]
                        c2y = c1y + stack[k + 2]
                        x = c2x
                        y = c2y + stack[k + 3]
                    else:  # hh
                        c1x = x + stack[k]
                        c1y = y + d1
                        c2x = c1x + stack[k + 1]
                        c2y = c1y + stack[k + 2]
                        x = c2x + stack[k + 3]
                        y = c2y
                    curveto(c1x, c1y, c2x, c2y, x, y)
                    d1 = 0.0
                    k += 4
                stack.clear()
            elif b in (30, 31):  # vhcurveto / hvcurveto
                horiz = b == 31
                k = 0
                while len(stack) - k >= 4:
                    last = len(stack) - k == 5
                    if horiz:
                        c1x = x + stack[k]
                        c1y = y
                        c2x = c1x + stack[k + 1]
                        c2y = c1y + stack[k + 2]
                        y = c2y + stack[k + 3]
                        x = c2x + (stack[k + 4] if last else 0.0)
                    else:
                        c1x = x
                        c1y = y + stack[k]
                        c2x = c1x + stack[k + 1]
                        c2y = c1y + stack[k + 2]
                        x = c2x + stack[k + 3]
                        y = c2y + (stack[k + 4] if last else 0.0)
                    curveto(c1x, c1y, c2x, c2y, x, y)
                    horiz = not horiz
                    k += 4
                stack.clear()
            elif b == 10:  # callsubr
                if stack:
                    idx = int(stack.pop()) + sb
                    if 0 <= idx < len(subrs):
                        call_stack.append((code, i))
                        code, i, n = subrs[idx], 0, len(subrs[idx])
            elif b == 29:  # callgsubr
                if stack:
                    idx = int(stack.pop()) + gb
                    if 0 <= idx < len(gsubrs):
                        call_stack.append((code, i))
                        code, i, n = gsubrs[idx], 0, len(gsubrs[idx])
            elif b == 11:  # return
                break
            elif b == 14:  # endchar
                if current:
                    contours.append(current)
                    current = []
                return contours
            elif b == 12:  # escape: flex family and arithmetic
                b2 = code[i]
                i += 1
                if b2 == 35:  # flex
                    a = stack
                    c1x = x + a[0]; c1y = y + a[1]
                    c2x = c1x + a[2]; c2y = c1y + a[3]
                    jx = c2x + a[4]; jy = c2y + a[5]
                    curveto(c1x, c1y, c2x, c2y, jx, jy)
                    c3x = jx + a[6]; c3y = jy + a[7]
                    c4x = c3x + a[8]; c4y = c3y + a[9]
                    x = c4x + a[10]; y = c4y + a[11]
                    curveto(c3x, c3y, c4x, c4y, x, y)
                    stack.clear()
                elif b2 == 34:  # hflex
                    a = stack
                    y0 = y
                    c1x = x + a[0]; c1y = y
                    c2x = c1x + a[1]; c2y = y + a[2]
                    jx = c2x + a[3]; jy = c2y
                    curveto(c1x, c1y, c2x, c2y, jx, jy)
                    c3x = jx + a[4]; c3y = c2y
                    c4x = c3x + a[5]; c4y = y0
                    x = c4x + a[6]; y = y0
                    curveto(c3x, c3y, c4x, c4y, x, y)
                    stack.clear()
                elif b2 == 36:  # hflex1
                    a = stack
                    y0 = y
                    c1x = x + a[0]; c1y = y + a[1]
                    c2x = c1x + a[2]; c2y = c1y + a[3]
                    jx = c2x + a[4]; jy = c2y
                    curveto(c1x, c1y, c2x, c2y, jx, jy)
                    c3x = jx + a[5]; c3y = c2y
                    c4x = c3x + a[6]; c4y = c3y + a[7]
                    x = c4x + a[8]; y = y0
                    curveto(c3x, c3y, c4x, c4y, x, y)
                    stack.clear()
                elif b2 == 37:  # flex1
                    a = stack
                    sx, sy = x, y
                    dx = a[0] + a[2] + a[4] + a[6] + a[8]
                    dy = a[1] + a[3] + a[5] + a[7] + a[9]
                    c1x = x + a[0]; c1y = y + a[1]
                    c2x = c1x + a[2]; c2y = c1y + a[3]
                    jx = c2x + a[4]; jy = c2y + a[5]
                    curveto(c1x, c1y, c2x, c2y, jx, jy)
                    c3x = jx + a[6]; c3y = jy + a[7]
                    c4x = c3x + a[8]; c4y = c3y + a[9]
                    if abs(dx) > abs(dy):
                        x = c4x + a[10]
                        y = sy
                    else:
                        x = sx
                        y = c4y + a[10]
                    curveto(c3x, c3y, c4x, c4y, x, y)
                    stack.clear()
                else:
                    stack.clear()
            else:
                stack.clear()
        if call_stack and i >= n:
            continue

    if current:
        contours.append(current)
    return contours


# --------------------------------------------------------------------------
# TrueType glyf outlines
# --------------------------------------------------------------------------

class TrueTypeFont:
    def __init__(self, data: bytes):
        self.data = data
        num_tables = struct.unpack(">H", data[4:6])[0]
        self.tables = {}
        for k in range(num_tables):
            off = 12 + k * 16
            tag = data[off : off + 4].decode("latin-1")
            t_off, t_len = struct.unpack(">II", data[off + 8 : off + 16])
            self.tables[tag] = (t_off, t_len)

        head_off = self.tables["head"][0]
        self.units_per_em = struct.unpack(
            ">H", data[head_off + 18 : head_off + 20]
        )[0]
        self.loc_format = struct.unpack(
            ">h", data[head_off + 50 : head_off + 52]
        )[0]
        maxp_off = self.tables["maxp"][0]
        self.n_glyphs = struct.unpack(">H", data[maxp_off + 4 : maxp_off + 6])[0]

        self._cmap = None
        self._advances = None

        loca_off, _ = self.tables["loca"]
        if self.loc_format == 0:
            raw = struct.unpack(
                f">{self.n_glyphs + 1}H",
                data[loca_off : loca_off + 2 * (self.n_glyphs + 1)],
            )
            self.loca = [v * 2 for v in raw]
        else:
            self.loca = list(
                struct.unpack(
                    f">{self.n_glyphs + 1}I",
                    data[loca_off : loca_off + 4 * (self.n_glyphs + 1)],
                )
            )
        self.glyf_off = self.tables["glyf"][0]

    # -- cmap / metrics (used by the searchable-PDF writer) --------------

    def cmap(self):
        """unicode codepoint -> gid (formats 4 and 12)."""
        if self._cmap is not None:
            return self._cmap
        data = self.data
        out = {}
        if "cmap" in self.tables:
            base = self.tables["cmap"][0]
            n = struct.unpack(">H", data[base + 2 : base + 4])[0]
            best = None
            for k in range(n):
                pid, eid, off = struct.unpack(
                    ">HHI", data[base + 4 + k * 8 : base + 12 + k * 8]
                )
                score = {(3, 10): 3, (0, 4): 3, (3, 1): 2, (0, 3): 2}.get(
                    (pid, eid), 0
                )
                if score and (best is None or score > best[0]):
                    best = (score, base + off)
            if best:
                sub = best[1]
                fmt = struct.unpack(">H", data[sub : sub + 2])[0]
                if fmt == 4:
                    seg2 = struct.unpack(">H", data[sub + 6 : sub + 8])[0]
                    segs = seg2 // 2
                    ends = struct.unpack(
                        f">{segs}H", data[sub + 14 : sub + 14 + seg2]
                    )
                    p0 = sub + 16 + seg2
                    starts = struct.unpack(f">{segs}H", data[p0 : p0 + seg2])
                    p1 = p0 + seg2
                    deltas = struct.unpack(f">{segs}h", data[p1 : p1 + seg2])
                    p2 = p1 + seg2
                    range_offs = struct.unpack(f">{segs}H", data[p2 : p2 + seg2])
                    for si in range(segs):
                        for c in range(starts[si], min(ends[si], 0xFFFF) + 1):
                            if range_offs[si] == 0:
                                g = (c + deltas[si]) & 0xFFFF
                            else:
                                addr = (
                                    p2 + si * 2 + range_offs[si]
                                    + (c - starts[si]) * 2
                                )
                                g = struct.unpack(">H", data[addr : addr + 2])[0]
                                if g:
                                    g = (g + deltas[si]) & 0xFFFF
                            if g:
                                out[c] = g
                elif fmt == 12:
                    n_groups = struct.unpack(">I", data[sub + 12 : sub + 16])[0]
                    for gi in range(n_groups):
                        s, e, g = struct.unpack(
                            ">III", data[sub + 16 + gi * 12 : sub + 28 + gi * 12]
                        )
                        for c in range(s, e + 1):
                            out[c] = g + (c - s)
        self._cmap = out
        return out

    def advance_width(self, gid):
        """hmtx advance in font units."""
        if self._advances is None:
            hhea = self.tables["hhea"][0]
            n_hm = struct.unpack(">H", self.data[hhea + 34 : hhea + 36])[0]
            hmtx = self.tables["hmtx"][0]
            adv = []
            for k in range(n_hm):
                adv.append(
                    struct.unpack(
                        ">H", self.data[hmtx + k * 4 : hmtx + k * 4 + 2]
                    )[0]
                )
            self._advances = adv
        if gid < len(self._advances):
            return self._advances[gid]
        return self._advances[-1] if self._advances else self.units_per_em // 2

    def glyph_path(self, gid, depth=0):
        if gid < 0 or gid >= self.n_glyphs or depth > 5:
            return []
        start = self.glyf_off + self.loca[gid]
        end = self.glyf_off + self.loca[gid + 1]
        if end <= start:
            return []
        data = self.data
        n_contours = struct.unpack(">h", data[start : start + 2])[0]
        if n_contours >= 0:
            return self._simple_glyph(start, n_contours)
        return self._composite_glyph(start + 10, depth)

    def _simple_glyph(self, start, n_contours):
        data = self.data
        p = start + 10
        end_pts = struct.unpack(
            f">{n_contours}H", data[p : p + 2 * n_contours]
        )
        p += 2 * n_contours
        n_points = (end_pts[-1] + 1) if n_contours else 0
        instr_len = struct.unpack(">H", data[p : p + 2])[0]
        p += 2 + instr_len

        flags = []
        while len(flags) < n_points:
            f = data[p]
            p += 1
            flags.append(f)
            if f & 8:  # repeat
                rep = data[p]
                p += 1
                flags.extend([f] * rep)
        flags = flags[:n_points]

        xs = []
        v = 0
        for f in flags:
            if f & 2:
                dx = data[p]
                p += 1
                v += dx if f & 16 else -dx
            elif not f & 16:
                v += struct.unpack(">h", data[p : p + 2])[0]
                p += 2
            xs.append(v)
        ys = []
        v = 0
        for f in flags:
            if f & 4:
                dy = data[p]
                p += 1
                v += dy if f & 32 else -dy
            elif not f & 32:
                v += struct.unpack(">h", data[p : p + 2])[0]
                p += 2
            ys.append(v)

        contours = []
        s = 0
        for e in end_pts:
            pts = [
                (xs[k], ys[k], bool(flags[k] & 1)) for k in range(s, e + 1)
            ]
            s = e + 1
            contours.append(_tt_contour_to_path(pts))
        return [c for c in contours if c]

    def _composite_glyph(self, p, depth):
        data = self.data
        contours = []
        while True:
            flags, gi = struct.unpack(">HH", data[p : p + 4])
            p += 4
            if flags & 1:  # ARG_1_AND_2_ARE_WORDS
                a1, a2 = struct.unpack(">hh", data[p : p + 4])
                p += 4
            else:
                a1, a2 = struct.unpack(">bb", data[p : p + 2])
                p += 2
            sx = sy = 1.0
            s01 = s10 = 0.0
            if flags & 8:  # WE_HAVE_A_SCALE
                sx = sy = struct.unpack(">h", data[p : p + 2])[0] / 16384.0
                p += 2
            elif flags & 0x40:  # X_AND_Y_SCALE
                sx = struct.unpack(">h", data[p : p + 2])[0] / 16384.0
                sy = struct.unpack(">h", data[p + 2 : p + 4])[0] / 16384.0
                p += 4
            elif flags & 0x80:  # 2x2
                sx, s01, s10, sy = [
                    v / 16384.0
                    for v in struct.unpack(">hhhh", data[p : p + 8])
                ]
                p += 8
            dx, dy = (a1, a2) if flags & 2 else (0, 0)  # ARGS_ARE_XY_VALUES
            sub = self.glyph_path(gi, depth + 1)
            for contour in sub:
                moved = []
                for seg in contour:
                    verb = seg[0]
                    pts = tuple(
                        (
                            x * sx + y * s10 + dx,
                            x * s01 + y * sy + dy,
                        )
                        for (x, y) in seg[1:]
                    )
                    moved.append((verb,) + pts)
                contours.append(moved)
            if not flags & 0x20:  # MORE_COMPONENTS
                break
        return contours


def _tt_contour_to_path(pts):
    """TrueType points (x, y, on_curve) -> path segments with quadratics;
    off-curve runs get implied on-curve midpoints."""
    if not pts:
        return []
    # rotate so the contour starts on-curve
    start_idx = next((k for k, p in enumerate(pts) if p[2]), None)
    if start_idx is None:
        # all off-curve: synthesize start at midpoint of first two
        mx = (pts[0][0] + pts[-1][0]) / 2.0
        my = (pts[0][1] + pts[-1][1]) / 2.0
        pts = [(mx, my, True)] + pts
        start_idx = 0
    pts = pts[start_idx:] + pts[:start_idx]

    path = [("M", (pts[0][0], pts[0][1]))]
    i = 1
    n = len(pts)
    prev_off = None
    while i <= n:
        px, py, on = pts[i % n]
        if on:
            if prev_off is None:
                if i < n:
                    path.append(("L", (px, py)))
            else:
                path.append(("Q", prev_off, (px, py)))
                prev_off = None
        else:
            if prev_off is not None:
                mx = (prev_off[0] + px) / 2.0
                my = (prev_off[1] + py) / 2.0
                path.append(("Q", prev_off, (mx, my)))
            prev_off = (px, py)
        i += 1
    if prev_off is not None:
        path.append(("Q", prev_off, (pts[0][0], pts[0][1])))
    return path
