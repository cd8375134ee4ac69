"""Minimal JBIG2 (ITU-T T.88) *encoder* used only by the tests.

Produces embedded-organization JBIG2 streams (the PDF JBIG2Decode flavor)
covering the paths native/jbig2.cpp decodes: arithmetic generic regions
(templates 0-3, AT pixels, TPGDON), symbol dictionaries and text regions.
The encoder implements the spec's MQ coder (T.88 Annex E) and integer
encoding procedures (Annex A) directly, so a decode(encode(x)) == x test
pins the decoder against an independent implementation of the standard.
"""

import numpy as np

# MQ-coder probability state table (T.88 Table E.1).
QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQEncoder:
    """T.88 Annex E.3 encoder (software conventions)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.cx = {}  # context key -> [state index, mps]

    def _state(self, key):
        return self.cx.setdefault(key, [0, 0])

    def _byteout(self):
        if self.out and self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            if self.out:
                self.out[-1] += 1
            else:
                # carry out of the (virtual) byte before the stream start
                self.out.append(1)
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self):
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, key, d):
        st = self._state(key)
        i, mps = st
        qe, nmps, nlps, sw = QE[i]
        if d == mps:
            self.a -= qe
            if not (self.a & 0x8000):
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                st[0] = nmps
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if sw:
                st[1] = 1 - mps
            st[0] = nlps
            self._renorm()

    def flush(self):
        tempc = (self.c + self.a - 1) & 0xFFFF0000
        if self.c < tempc:
            self.c = tempc
        else:
            self.c = tempc + 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if not self.out or self.out[-1] != 0xFF:
            self.out.append(0xFF)
        self.out.append(0xAC)
        return bytes(self.out)


class IntEncoder:
    """T.88 Annex A integer encoding over a named context bank."""

    def __init__(self, mq, bank):
        self.mq = mq
        self.bank = bank
        self.prev = 1

    def _bit(self, b):
        self.mq.encode((self.bank, self.prev), b)
        p = (self.prev << 1) | b
        self.prev = p if self.prev < 256 else ((p & 511) | 256)

    def _bits(self, v, k):
        for i in range(k - 1, -1, -1):
            self._bit((v >> i) & 1)

    def encode(self, v):
        self.prev = 1
        s = 1 if v < 0 else 0
        m = -v if v < 0 else v
        self._bit(s)
        if m < 4:
            self._bit(0)
            self._bits(m, 2)
        elif m < 20:
            self._bit(1)
            self._bit(0)
            self._bits(m - 4, 4)
        elif m < 84:
            self._bit(1)
            self._bit(1)
            self._bit(0)
            self._bits(m - 20, 6)
        elif m < 340:
            self._bit(1)
            self._bit(1)
            self._bit(1)
            self._bit(0)
            self._bits(m - 84, 8)
        elif m < 4436:
            self._bit(1)
            self._bit(1)
            self._bit(1)
            self._bit(1)
            self._bit(0)
            self._bits(m - 340, 12)
        else:
            self._bit(1)
            self._bit(1)
            self._bit(1)
            self._bit(1)
            self._bit(1)
            self._bits(m - 4436, 32)

    def encode_oob(self):
        self.prev = 1
        self._bit(1)  # sign
        self._bit(0)  # first magnitude branch
        self._bits(0, 2)


def encode_iaid(mq, codelen, value):
    prev = 1
    t = value + (1 << codelen)
    for i in range(codelen - 1, -1, -1):
        b = (t >> i) & 1
        mq.encode(("IAID", prev), b)
        prev = (prev << 1) | b


# Generic-region context layouts; must mirror native/jbig2.cpp.
def _generic_context(bm, x, y, tmpl, at):
    def g(dx, dy):
        xx, yy = x + dx, y + dy
        if xx < 0 or yy < 0 or xx >= bm.shape[1] or yy >= bm.shape[0]:
            return 0
        return int(bm[yy, xx])

    if tmpl == 0:
        return (
            g(-1, 0) | (g(-2, 0) << 1) | (g(-3, 0) << 2) | (g(-4, 0) << 3)
            | (g(at[0], at[1]) << 4)
            | (g(2, -1) << 5) | (g(1, -1) << 6) | (g(0, -1) << 7)
            | (g(-1, -1) << 8) | (g(-2, -1) << 9)
            | (g(at[2], at[3]) << 10) | (g(at[4], at[5]) << 11)
            | (g(1, -2) << 12) | (g(0, -2) << 13) | (g(-1, -2) << 14)
            | (g(at[6], at[7]) << 15)
        )
    if tmpl == 1:
        return (
            g(-1, 0) | (g(-2, 0) << 1) | (g(-3, 0) << 2)
            | (g(at[0], at[1]) << 3)
            | (g(2, -1) << 4) | (g(1, -1) << 5) | (g(0, -1) << 6)
            | (g(-1, -1) << 7) | (g(-2, -1) << 8)
            | (g(2, -2) << 9) | (g(1, -2) << 10) | (g(0, -2) << 11)
            | (g(-1, -2) << 12)
        )
    if tmpl == 2:
        return (
            g(-1, 0) | (g(-2, 0) << 1) | (g(at[0], at[1]) << 2)
            | (g(1, -1) << 3) | (g(0, -1) << 4) | (g(-1, -1) << 5)
            | (g(-2, -1) << 6)
            | (g(1, -2) << 7) | (g(0, -2) << 8) | (g(-1, -2) << 9)
        )
    return (
        g(-1, 0) | (g(-2, 0) << 1) | (g(-3, 0) << 2) | (g(-4, 0) << 3)
        | (g(at[0], at[1]) << 4)
        | (g(1, -1) << 5) | (g(0, -1) << 6) | (g(-1, -1) << 7)
        | (g(-2, -1) << 8) | (g(-3, -1) << 9)
    )


TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}
NOMINAL_AT = {
    0: (3, -1, -3, -1, 2, -2, -2, -2),
    1: (3, -1),
    2: (2, -1),
    3: (2, -1),
}


def encode_generic_bitmap(mq, bm, tmpl=0, tpgdon=False, at=None, bank="GB"):
    """Encode bitmap (1=black) pixels into an existing MQ encoder."""
    at = at if at is not None else NOMINAL_AT[tmpl]
    ltp = 0
    for y in range(bm.shape[0]):
        if tpgdon:
            typical = y > 0 and bool((bm[y] == bm[y - 1]).all())
            sltp = 1 if (typical != bool(ltp)) else 0
            mq.encode((bank, TPGDON_CTX[tmpl]), sltp)
            ltp ^= sltp
            if ltp:
                continue
        for x in range(bm.shape[1]):
            ctx = _generic_context(bm, x, y, tmpl, at)
            mq.encode((bank, ctx), int(bm[y, x]))


# ---------------------------------------------------------------------------
# Segment assembly (embedded organization, T.88 section 7).


def segment_header(number, seg_type, referred=(), page=1, length=0):
    out = bytearray()
    out += number.to_bytes(4, "big")
    out.append(seg_type & 0x3F)  # page association in 1 byte
    if len(referred) >= 7:
        raise NotImplementedError("long-form referred list not needed in tests")
    out.append(len(referred) << 5)
    for refnum in referred:
        if number <= 256:
            out += bytes([refnum])
        elif number <= 65536:
            out += refnum.to_bytes(2, "big")
        else:
            out += refnum.to_bytes(4, "big")
    out.append(page)
    out += length.to_bytes(4, "big")
    return bytes(out)


def region_info(w, h, x=0, y=0, combop=0):
    return (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + x.to_bytes(4, "big") + y.to_bytes(4, "big") + bytes([combop])
    )


def page_info_segment(number, w, h, def_pixel=0):
    data = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([def_pixel << 2]) + (0).to_bytes(2, "big")
    )
    return segment_header(number, 48, length=len(data)) + data


def generic_region_segment(number, bm, tmpl=0, tpgdon=False, at=None,
                           x=0, y=0, combop=0, mmr_data=None):
    h, w = bm.shape
    body = bytearray(region_info(w, h, x, y, combop))
    if mmr_data is not None:
        body.append(1)  # MMR
        body += mmr_data
    else:
        at = at if at is not None else NOMINAL_AT[tmpl]
        body.append((tmpl << 1) | (8 if tpgdon else 0))
        nat = 4 if tmpl == 0 else 1
        for i in range(nat):
            body += bytes([at[2 * i] & 0xFF, at[2 * i + 1] & 0xFF])
        mq = MQEncoder()
        encode_generic_bitmap(mq, bm, tmpl, tpgdon, at)
        body += mq.flush()
    return segment_header(number, 39, length=len(body)) + bytes(body)


def symbol_dict_segment(number, symbols, tmpl=0, at=None):
    """symbols: list of (h, w) uint8 bitmaps; all become exported symbols."""
    at = at if at is not None else NOMINAL_AT[tmpl]
    body = bytearray()
    body += (tmpl << 10).to_bytes(2, "big")  # SDHUFF=0, SDREFAGG=0
    nat = 4 if tmpl == 0 else 1
    for i in range(nat):
        body += bytes([at[2 * i] & 0xFF, at[2 * i + 1] & 0xFF])
    body += len(symbols).to_bytes(4, "big")  # SDNUMEXSYMS
    body += len(symbols).to_bytes(4, "big")  # SDNUMNEWSYMS

    mq = MQEncoder()
    iadh = IntEncoder(mq, "IADH")
    iadw = IntEncoder(mq, "IADW")
    iaex = IntEncoder(mq, "IAEX")
    hcheight = 0
    i = 0
    while i < len(symbols):
        j = i
        while j < len(symbols) and symbols[j].shape[0] == symbols[i].shape[0]:
            j += 1
        iadh.encode(symbols[i].shape[0] - hcheight)
        hcheight = symbols[i].shape[0]
        symwidth = 0
        for k in range(i, j):
            iadw.encode(symbols[k].shape[1] - symwidth)
            symwidth = symbols[k].shape[1]
            encode_generic_bitmap(mq, symbols[k], tmpl, False, at)
        iadw.encode_oob()
        i = j
    iaex.encode(0)              # run of 0 non-exported symbols
    iaex.encode(len(symbols))   # run exporting everything
    body += mq.flush()
    return segment_header(number, 0, length=len(body)) + bytes(body)


def text_region_segment(number, symdict_number, w, h, instances, symbols,
                        x=0, y=0, combop=0, refcorner=1, transposed=False,
                        log2strips=0, sbcombop=0, dsoffset=0):
    """instances: list of (symbol_id, x, y) where (x, y) is the TOP-LEFT
    of the placed bitmap regardless of refcorner (the encoder converts to
    the refcorner's coordinates).  symbols: the bitmaps of the referred
    dictionary (needed for the CURS advance).  refcorner: 0=BL, 1=TL,
    2=BR, 3=TR."""
    body = bytearray(region_info(w, h, x, y, combop))
    flags = (
        (refcorner << 4)
        | ((1 if transposed else 0) << 6)
        | (log2strips << 2)
        | ((sbcombop & 3) << 7)
        | ((dsoffset & 0x1F) << 10)
    )
    body += flags.to_bytes(2, "big")
    body += len(instances).to_bytes(4, "big")

    codelen = max(1, (len(symbols) - 1).bit_length())
    sbstrips = 1 << log2strips
    mq = MQEncoder()
    iadt = IntEncoder(mq, "IADT")
    iafs = IntEncoder(mq, "IAFS")
    iads = IntEncoder(mq, "IADS")
    iait = IntEncoder(mq, "IAIT")

    def coords(sid, px, py):
        """(S left-edge/top-edge, T as decoded) for the instance whose
        top-left lands at (px, py)."""
        sh, sw = symbols[sid].shape
        if not transposed:
            s = px
            t = py if refcorner in (1, 3) else py + sh - 1
            adv = sw - 1
        else:
            s = py
            t = px if refcorner in (0, 1) else px + sw - 1
            adv = sh - 1
        return s, t, adv

    conv = [(sid,) + coords(sid, px, py) for sid, px, py in instances]
    # group into strips of sbstrips consecutive T values
    conv.sort(key=lambda e: ((e[2] // sbstrips) * sbstrips, e[1]))
    iadt.encode(0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    i = 0
    while i < len(conv):
        strip_t = (conv[i][2] // sbstrips) * sbstrips
        assert (strip_t - stript) % sbstrips == 0
        iadt.encode((strip_t - stript) // sbstrips)
        stript = strip_t
        curs = None
        while i < len(conv) and (conv[i][2] // sbstrips) * sbstrips == strip_t:
            sid, s, t, adv = conv[i]
            if curs is None:
                iafs.encode(s - firsts)
                firsts = s
            else:
                iads.encode(s - curs - dsoffset)
            if sbstrips > 1:
                iait.encode(t - strip_t)
            encode_iaid(mq, codelen, sid)
            curs = s + adv
            i += 1
        iads.encode_oob()
    body += mq.flush()
    return segment_header(number, 6, referred=[symdict_number],
                          length=len(body)) + bytes(body)
