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
        # SETBITS (E.3.8): saturate the low 16 bits of C to ONES, pulling
        # back 0x8000 if that overshoots C+A.  The ones matter: decoders
        # pad the stream tail with 1-bits, so a codeword with trailing
        # zeros can drift UP past the subinterval boundary once padding
        # kicks in (observed as a wrong final decision on streams whose
        # last decision ended near the interval top).
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
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


def encode_generic_bitmap(mq, bm, tmpl=0, tpgdon=False, at=None, bank="GB",
                          skip=None):
    """Encode bitmap (1=black) pixels into an existing MQ encoder.  Pixels
    where ``skip`` is set are not coded (the decoder forces them to 0, so
    the bitmap must hold 0 there for a faithful round trip)."""
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
            if skip is not None and skip[y, x]:
                continue
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


# ---------------------------------------------------------------------------
# Huffman mode (T.88 Annex B standard tables + section 6.5/6.4 Huffman
# decoding paths).  Table data transcribed from T.88 Annex B; structural
# invariants (contiguous value ranges, Kraft inequality, canonical
# prefix-freeness) are pinned by test_jbig2_huffman_tables_wellformed.

# (preflen, rangelen, rangelow, kind) — kind: "" normal, "lower" (value =
# rangelow - offset, 32-bit), "oob".  Order matters: canonical prefix codes
# are assigned in listed order per Annex B.3.
STD_TABLES = {
    1: [(1, 4, 0, ""), (2, 8, 16, ""), (3, 16, 272, ""),
        (3, 32, 65808, "")],
    2: [(1, 0, 0, ""), (2, 0, 1, ""), (3, 0, 2, ""), (4, 3, 3, ""),
        (5, 6, 11, ""), (6, 32, 75, ""), (6, 0, 0, "oob")],
    3: [(8, 8, -256, ""), (1, 0, 0, ""), (2, 0, 1, ""), (3, 0, 2, ""),
        (4, 3, 3, ""), (5, 6, 11, ""), (8, 32, -257, "lower"),
        (7, 32, 75, ""), (6, 0, 0, "oob")],
    4: [(1, 0, 1, ""), (2, 0, 2, ""), (3, 0, 3, ""), (4, 3, 4, ""),
        (5, 6, 12, ""), (5, 32, 76, "")],
    5: [(7, 8, -255, ""), (1, 0, 1, ""), (2, 0, 2, ""), (3, 0, 3, ""),
        (4, 3, 4, ""), (5, 6, 12, ""), (7, 32, -256, "lower"),
        (6, 32, 76, "")],
    6: [(5, 10, -2048, ""), (4, 9, -1024, ""), (4, 8, -512, ""),
        (4, 7, -256, ""), (5, 6, -128, ""), (5, 5, -64, ""),
        (4, 5, -32, ""), (2, 7, 0, ""), (3, 7, 128, ""), (3, 8, 256, ""),
        (4, 9, 512, ""), (4, 10, 1024, ""), (6, 32, -2049, "lower"),
        (6, 32, 2048, "")],
    # B.7's (0..511)/(512..1535) prefix lengths are pinned by the
    # completeness invariant (Kraft sum = 1) given the table's firmly
    # documented negative side and 3-bit lower/upper lines — the unique
    # completion, mirroring B.6's shortest-code-on-[0,..) design.
    7: [(4, 9, -1024, ""), (3, 8, -512, ""), (4, 7, -256, ""),
        (5, 6, -128, ""), (5, 5, -64, ""), (4, 5, -32, ""), (2, 9, 0, ""),
        (3, 10, 512, ""), (3, 32, -1025, "lower"), (3, 32, 1536, "")],
    8: [(8, 3, -15, ""), (9, 1, -7, ""), (8, 1, -5, ""), (9, 0, -3, ""),
        (7, 0, -2, ""), (4, 0, -1, ""), (2, 1, 0, ""), (5, 0, 2, ""),
        (6, 0, 3, ""), (3, 4, 4, ""), (6, 1, 20, ""), (4, 4, 22, ""),
        (4, 5, 38, ""), (5, 6, 70, ""), (5, 7, 134, ""), (6, 7, 262, ""),
        (7, 8, 390, ""), (6, 10, 646, ""), (9, 32, -16, "lower"),
        (9, 32, 1670, ""), (2, 0, 0, "oob")],
    9: [(8, 4, -31, ""), (9, 2, -15, ""), (8, 2, -11, ""), (9, 1, -7, ""),
        (7, 1, -5, ""), (4, 1, -3, ""), (3, 1, -1, ""), (3, 1, 1, ""),
        (5, 1, 3, ""), (6, 1, 5, ""), (3, 5, 7, ""), (6, 2, 39, ""),
        (4, 5, 43, ""), (4, 6, 75, ""), (5, 7, 139, ""), (5, 8, 267, ""),
        (6, 8, 523, ""), (7, 9, 779, ""), (6, 11, 1291, ""),
        (9, 32, -32, "lower"), (9, 32, 3339, ""), (2, 0, 0, "oob")],
    10: [(7, 4, -21, ""), (8, 0, -5, ""), (7, 0, -4, ""), (5, 0, -3, ""),
         (2, 2, -2, ""), (5, 0, 2, ""), (6, 0, 3, ""), (7, 0, 4, ""),
         (8, 0, 5, ""), (2, 6, 6, ""), (5, 5, 70, ""), (6, 5, 102, ""),
         (7, 6, 134, ""), (8, 7, 198, ""), (8, 8, 326, ""),
         (8, 9, 582, ""), (8, 10, 1094, ""), (7, 11, 2118, ""),
         (8, 32, -22, "lower"), (8, 32, 4166, ""), (2, 0, 0, "oob")],
    11: [(1, 0, 1, ""), (2, 1, 2, ""), (4, 0, 4, ""), (4, 1, 5, ""),
         (5, 1, 7, ""), (5, 2, 9, ""), (6, 2, 13, ""), (7, 2, 17, ""),
         (7, 3, 21, ""), (7, 4, 29, ""), (7, 5, 45, ""), (7, 6, 77, ""),
         (7, 32, 141, "")],
    12: [(1, 0, 1, ""), (2, 0, 2, ""), (3, 1, 3, ""), (5, 0, 5, ""),
         (5, 1, 6, ""), (6, 1, 8, ""), (7, 0, 10, ""), (7, 1, 11, ""),
         (7, 2, 13, ""), (7, 3, 17, ""), (7, 4, 25, ""), (8, 5, 41, ""),
         (8, 32, 73, "")],
    13: [(1, 0, 1, ""), (3, 0, 2, ""), (4, 0, 3, ""), (5, 0, 4, ""),
         (4, 1, 5, ""), (3, 3, 7, ""), (6, 1, 15, ""), (6, 2, 17, ""),
         (6, 3, 21, ""), (6, 4, 29, ""), (6, 5, 45, ""), (7, 6, 77, ""),
         (7, 32, 141, "")],
    14: [(3, 0, -2, ""), (3, 0, -1, ""), (1, 0, 0, ""), (3, 0, 1, ""),
         (3, 0, 2, "")],
    15: [(7, 4, -24, ""), (6, 2, -8, ""), (5, 1, -4, ""), (4, 0, -2, ""),
         (3, 0, -1, ""), (1, 0, 0, ""), (3, 0, 1, ""), (4, 0, 2, ""),
         (5, 1, 3, ""), (6, 2, 5, ""), (7, 4, 9, ""),
         (7, 32, -25, "lower"), (7, 32, 25, "")],
}


class BitWriter:
    """MSB-first bit writer (the Huffman-mode segment payload format)."""

    def __init__(self):
        self.bits = []

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((int(value) >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def write_bytes(self, data):
        self.align()
        for b in data:
            self.write(b, 8)

    def flush(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def assign_prefix_codes(lines):
    """Canonical code assignment (T.88 B.3): by length ascending, in the
    listed order within a length.  Lines with preflen 0 get no code."""
    maxlen = max((ln[0] for ln in lines), default=0)
    codes = {}
    curcode = 0
    for length in range(1, maxlen + 1):
        for i, ln in enumerate(lines):
            if ln[0] == length:
                codes[i] = (length, curcode)
                curcode += 1
        curcode <<= 1
    return codes


class HuffEncoder:
    """Encode values against one Annex-B-style table (list of lines)."""

    def __init__(self, bw, lines):
        self.bw = bw
        self.lines = list(lines)
        self.codes = assign_prefix_codes(self.lines)

    def _emit(self, idx):
        length, code = self.codes[idx]
        self.bw.write(code, length)

    def encode(self, value):
        lower = upper = None
        for i, (pl, rl, low, kind) in enumerate(self.lines):
            if pl == 0:
                continue
            if kind == "lower":
                lower = (i, low)
                continue
            if kind == "oob":
                continue
            if rl == 32:
                upper = (i, low)
                continue
            if low <= value < low + (1 << rl):
                self._emit(i)
                self.bw.write(value - low, rl)
                return
        if lower is not None and value <= lower[1]:
            self._emit(lower[0])
            self.bw.write(lower[1] - value, 32)
            return
        if upper is not None and value >= upper[1]:
            self._emit(upper[0])
            self.bw.write(value - upper[1], 32)
            return
        raise ValueError(f"value {value} not encodable")

    def encode_oob(self):
        for i, ln in enumerate(self.lines):
            if ln[3] == "oob":
                self._emit(i)
                return
        raise ValueError("table has no OOB line")


def custom_table_lines(lines, low, high, oob=False):
    """The HuffEncoder line list equivalent to custom_table_segment's
    payload — normal lines tiling [low, high), then lower/upper (and OOB)
    in that listed order, matching the decoder's canonical assignment."""
    out = []
    cur = low
    for preflen, rangelen in lines[: -3 if oob else -2]:
        out.append((preflen, rangelen, cur, ""))
        cur += 1 << rangelen
    tail = lines[-3 if oob else -2 :]
    out.append((tail[0][0], 32, low - 1, "lower"))
    out.append((tail[1][0], 32, high, ""))
    if oob:
        out.append((tail[2][0], 0, 0, "oob"))
    return out


def huff_symbol_dict_segment(number, symbols, mmr_encode=None,
                             dw_custom=None):
    """SDHUFF=1 symbol dictionary: heights via B.4, widths via B.2 (or a
    custom type-53 table via ``dw_custom=(table_segnum, enc_lines)``),
    collective bitmaps per height class either uncompressed (BMSIZE=0,
    row-byte-aligned) or MMR via ``mmr_encode(bitmap)->bytes``."""
    body = bytearray()
    flags = 1  # SDHUFF=1
    referred = []
    dw_lines = STD_TABLES[2]
    if dw_custom is not None:
        table_segnum, dw_lines = dw_custom
        flags |= 3 << 4  # SDHUFFDW = custom
        referred = [table_segnum]
    body += flags.to_bytes(2, "big")
    body += len(symbols).to_bytes(4, "big")  # SDNUMEXSYMS
    body += len(symbols).to_bytes(4, "big")  # SDNUMNEWSYMS

    bw = BitWriter()
    dh = HuffEncoder(bw, STD_TABLES[4])
    dw = HuffEncoder(bw, dw_lines)
    bms = HuffEncoder(bw, STD_TABLES[1])
    ex = HuffEncoder(bw, STD_TABLES[1])
    hcheight = 0
    i = 0
    while i < len(symbols):
        j = i
        while j < len(symbols) and symbols[j].shape[0] == symbols[i].shape[0]:
            j += 1
        dh.encode(symbols[i].shape[0] - hcheight)
        hcheight = symbols[i].shape[0]
        symwidth = 0
        for k in range(i, j):
            dw.encode(symbols[k].shape[1] - symwidth)
            symwidth = symbols[k].shape[1]
        dw.encode_oob()
        coll = np.concatenate([symbols[k] for k in range(i, j)], axis=1)
        if mmr_encode is None:
            bms.encode(0)
            bw.align()
            for row in coll:
                for px in row:
                    bw.write(int(px), 1)
                bw.align()
        else:
            data = mmr_encode(coll)
            bms.encode(len(data))
            bw.write_bytes(data)
        i = j
    ex.encode(0)
    ex.encode(len(symbols))
    body += bw.flush()
    return segment_header(number, 0, referred=referred,
                          length=len(body)) + bytes(body)


def huff_text_region_segment(number, symdict_number, w, h, instances,
                             symbols, x=0, y=0, combop=0, refcorner=1,
                             transposed=False, log2strips=0, sbcombop=0,
                             dsoffset=0):
    """SBHUFF=1 text region: FS via B.6, DS via B.8, DT via B.11; symbol
    ID codes carried by the runcode mechanism (7.4.3.1.7) with one
    fixed length for every symbol."""
    body = bytearray(region_info(w, h, x, y, combop))
    flags = (
        1  # SBHUFF
        | (refcorner << 4)
        | ((1 if transposed else 0) << 6)
        | (log2strips << 2)
        | ((sbcombop & 3) << 7)
        | ((dsoffset & 0x1F) << 10)
    )
    body += flags.to_bytes(2, "big")
    body += (0).to_bytes(2, "big")  # huffman flags: all selectors 0
    body += len(instances).to_bytes(4, "big")

    codelen = max(1, (len(symbols) - 1).bit_length())
    sbstrips = 1 << log2strips
    bw = BitWriter()
    # runcode lengths: only runcode `codelen` used, with prefix length 1
    for i in range(35):
        bw.write(1 if i == codelen else 0, 4)
    # every symbol's code length = codelen, emitted as 1-bit runcodes
    for _ in range(len(symbols)):
        bw.write(0, 1)  # the single runcode's canonical code is "0"
    bw.align()

    dt = HuffEncoder(bw, STD_TABLES[11])
    fs = HuffEncoder(bw, STD_TABLES[6])
    ds = HuffEncoder(bw, STD_TABLES[8])

    def coords(sid, px, py):
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
    conv.sort(key=lambda e: ((e[2] // sbstrips) * sbstrips, e[1]))
    # table B.11 has no zero: start STRIPT one strip below the page so the
    # first strip's DT delta is >= 1
    dt.encode(1)
    stript = -sbstrips
    firsts = 0
    i = 0
    while i < len(conv):
        strip_t = (conv[i][2] // sbstrips) * sbstrips
        assert (strip_t - stript) % sbstrips == 0
        dt.encode((strip_t - stript) // sbstrips)
        stript = strip_t
        curs = None
        while i < len(conv) and (conv[i][2] // sbstrips) * sbstrips == strip_t:
            sid, s, t, adv = conv[i]
            if curs is None:
                fs.encode(s - firsts)
                firsts = s
            else:
                ds.encode(s - curs - dsoffset)
            if sbstrips > 1:
                bw.write(t - strip_t, log2strips)
            bw.write(sid, codelen)  # fixed-length canonical symbol codes
            curs = s + adv
            i += 1
        ds.encode_oob()
    body += bw.flush()
    return segment_header(number, 6, referred=[symdict_number],
                          length=len(body)) + bytes(body)


def custom_table_segment(number, lines, low, high, oob=False, htps=8,
                         htrs=8):
    """Type-53 custom Huffman table (T.88 B.2.4): ``lines`` are
    (preflen, rangelen) pairs tiling [low, high); lower/upper prefix
    lengths follow, then the OOB prefix length when ``oob``."""
    bw = BitWriter()
    cur = low
    payload_lines = []
    for preflen, rangelen in lines[: -3 if oob else -2]:
        bw.write(preflen, htps)
        bw.write(rangelen, htrs)
        payload_lines.append((preflen, rangelen))
        cur += 1 << rangelen
    assert cur >= high, "lines must tile [low, high)"
    for preflen, _ in lines[-3 if oob else -2 :]:
        bw.write(preflen, htps)
    body = bytearray()
    body.append((1 if oob else 0) | ((htps - 1) << 1) | ((htrs - 1) << 4))
    body += int(low).to_bytes(4, "big", signed=True)
    body += int(high).to_bytes(4, "big", signed=True)
    body += bw.flush()
    return segment_header(number, 53, length=len(body)) + bytes(body)


# ---------------------------------------------------------------------------
# Pattern dictionaries + halftone regions (T.88 6.6/6.7 + Annex C).


def pattern_dict_segment(number, patterns, tmpl=0, mmr_encode=None):
    """Type-16 pattern dictionary: ``patterns`` is a list of equally sized
    (HDPH, HDPW) bitmaps for gray values 0..GRAYMAX; coded as one
    collective generic region with A1 = (-HDPW, 0)."""
    hdph, hdpw = patterns[0].shape
    graymax = len(patterns) - 1
    coll = np.concatenate(patterns, axis=1)
    body = bytearray()
    body.append((1 if mmr_encode else 0) | (tmpl << 1))
    body.append(hdpw)
    body.append(hdph)
    body += graymax.to_bytes(4, "big")
    if mmr_encode is not None:
        body += mmr_encode(coll)
    else:
        at = (-hdpw, 0, -3, -1, 2, -2, -2, -2)
        mq = MQEncoder()
        encode_generic_bitmap(mq, coll, tmpl, False, at)
        body += mq.flush()
    return segment_header(number, 16, length=len(body)) + bytes(body)


def halftone_skip(hgw, hgh, w, h, hpw, hph, hgx, hgy, hrx, hry):
    """Skip bitmap (6.6.5.1): grid cells whose pattern lies fully outside
    the region are not coded."""
    skip = np.zeros((hgh, hgw), np.uint8)
    for m in range(hgh):
        for n in range(hgw):
            x = (hgx + m * hry + n * hrx) >> 8
            y = (hgy + m * hrx - n * hry) >> 8
            if x + hpw <= 0 or x >= w or y + hph <= 0 or y >= h:
                skip[m, n] = 1
    return skip


def halftone_region_segment(number, patdict_number, w, h, gray, patterns,
                            x=0, y=0, combop=0, tmpl=0, enableskip=False,
                            hcombop=0, defpixel=0, hgx=0, hgy=0, hrx=None,
                            hry=0, mmr_encode=None):
    """Type-22 halftone region: ``gray`` is an (HGH, HGW) array of pattern
    indices; planes are gray-coded (g = v ^ (v >> 1)) MSB first through one
    shared arithmetic context, or one continuous MMR stream.  hgx/hgy/hrx/
    hry are 8.8 fixed-point; hrx defaults to pattern_width << 8 (an
    axis-aligned grid)."""
    hdph, hdpw = patterns[0].shape
    if hrx is None:
        hrx = hdpw << 8
    hgh, hgw = gray.shape
    body = bytearray(region_info(w, h, x, y, combop))
    body.append((1 if mmr_encode else 0) | (tmpl << 1)
                | ((1 if enableskip else 0) << 3) | (hcombop << 4)
                | (defpixel << 7))
    body += hgw.to_bytes(4, "big")
    body += hgh.to_bytes(4, "big")
    body += int(hgx).to_bytes(4, "big", signed=True)
    body += int(hgy).to_bytes(4, "big", signed=True)
    body += int(hrx).to_bytes(2, "big")
    body += int(hry).to_bytes(2, "big")

    bits = max(1, (len(patterns) - 1).bit_length())
    g = (np.asarray(gray, np.int64) ^ (np.asarray(gray, np.int64) >> 1))
    skip = None
    if enableskip and mmr_encode is None:
        skip = halftone_skip(hgw, hgh, w, h, hdpw, hdph, hgx, hgy, hrx, hry)
    planes = [((g >> j) & 1).astype(np.uint8) for j in range(bits - 1, -1, -1)]
    if skip is not None:
        planes = [p & (1 - skip) for p in planes]
    if mmr_encode is not None:
        body += mmr_encode(np.concatenate(planes, axis=0))
    else:
        at = ((3 if tmpl <= 1 else 2), -1, -3, -1, 2, -2, -2, -2)
        mq = MQEncoder()
        for p in planes:
            encode_generic_bitmap(mq, p, tmpl, False, at, skip=skip)
        body += mq.flush()
    return segment_header(number, 22, referred=[patdict_number],
                          length=len(body)) + bytes(body)
