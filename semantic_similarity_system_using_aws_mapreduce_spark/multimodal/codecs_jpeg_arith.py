"""Arithmetic-coded JPEG (ITU-T T.81 Annex D coder + Annex F
statistical models) behind SOF9/SOF10, libjpeg-conformance-tested,
plus the marker-walk helper both entropy layers share.  The DCT /
dequant / upsampling pipeline lives in codecs_jpeg."""

from __future__ import annotations

def _jpeg_next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker (0xFF followed by non-zero,
    non-RST) at or after ``pos`` — where the segment walk resumes
    after an entropy-coded scan."""
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF:
            # T.81 §B.1.1.2: markers may be preceded by any number of
            # 0xFF fill bytes — skip the run so the next byte examined
            # is the marker code, not another 0xFF
            while p + 1 < len(data) and data[p + 1] == 0xFF:
                p += 1
            if p + 1 >= len(data):
                break
            if data[p + 1] != 0x00 and not (0xD0 <= data[p + 1] <= 0xD7):
                return p
        p += 1
    raise ValueError("truncated JPEG stream after scan")


# ---------------------------------------------------------------------------
# Arithmetic-coded JPEG (ITU-T T.81 Annex D coder + Annex F statistical
# models) — the entropy layer behind SOF9 (extended sequential) and
# SOF10 (progressive).  Everything below is stdlib + numpy; the DCT /
# dequant / upsampling pipeline is shared with the Huffman path, so an
# arithmetic and a Huffman encoding of the SAME quantized coefficients
# must decode bit-identically (the cross-entropy-coder test pins it).
#
# _ARITH_QE is T.81 Table D.3 verbatim (the public QM-coder
# probability-estimation state machine, shared with T.82/JBIG),
# cross-checked entry-by-entry against the system libjpeg's exported
# ``jpeg_aritab`` by tests/test_multimodal.py when that library is
# present.  Entry 113 is the conventional non-adaptive "fixed 0.5"
# bin used for AC sign and DC-refinement decisions: it transitions to
# itself and never switches, so encode/decode never adapt it.
#
# Reference parity note: the reference repo has no image path at all
# (App.java drives text MapReduce only); this section exists for the
# engine's multimodal-column surface (SURVEY §2 north-star extensions).

_ARITH_QE = (
    # (Qe, NMPS, NLPS, switch) — T.81 Table D.3, states 0..112 + fixed bin 113
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0), (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1), (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0), (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0), (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0), (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0), (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0), (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0), (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0), (0x0363, 54, 51, 0), (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0), (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0), (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0), (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0), (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0), (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0), (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0), (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0), (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0), (0x5231, 102, 105, 0), (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

_ARITH_FIXED = 113  # the non-adaptive 0.5 bin (AC signs, DC refinement)


class _ArithDecoder:
    """T.81 D.2 binary arithmetic decoder over one entropy-coded
    segment.  Register convention: ``a`` is the current interval width
    (renormalized into [0x8000, 0x10000)), ``c`` the code-offset
    window at the same scale, so the MPS occupies the bottom
    sub-interval and decisions are plain integer compares — the
    conditional MPS/LPS exchange of D.2.4 applies when the MPS width
    falls below Qe.  Byte stuffing (a data 0xFF is followed by 0x00)
    is undone inline; per D.2.6, hitting the scan's terminating marker
    is LEGAL mid-decode and supplies zero bytes from then on.  Context
    state is packed one byte per context: (MPS << 7) | state_index."""

    __slots__ = ("d", "p", "hit_marker", "acc", "n", "a", "c")

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self.hit_marker = False
        self.acc = 0
        self.n = 0
        c = self._byte() << 8
        self.c = c | self._byte()
        self.a = 0x10000

    def _byte(self) -> int:
        if self.hit_marker:
            return 0
        d, p = self.d, self.p
        if p >= len(d):
            raise ValueError("truncated JPEG scan (no terminating marker)")
        b = d[p]
        if b == 0xFF:
            q = p + 1
            while q < len(d) and d[q] == 0xFF:
                q += 1  # 0xFF fill run
            if q < len(d) and d[q] == 0x00:
                self.p = q + 1
                return 0xFF  # stuffed data byte
            # a real marker terminates the feed; zero bytes follow (D.2.6)
            self.hit_marker = True
            return 0
        self.p = p + 1
        return b

    def decode(self, st: bytearray, i: int) -> int:
        sv = st[i]
        qe, nmps, nlps, switch = _ARITH_QE[sv & 0x7F]
        mps = sv >> 7
        a = self.a - qe
        if self.c >= a:
            # code offset in the TOP sub-interval (width qe)
            self.c -= a
            if a < qe:  # conditional exchange: the MPS moved on top
                bit = mps
                st[i] = (sv & 0x80) | nmps
            else:
                bit = mps ^ 1
                st[i] = ((mps ^ switch) << 7) | nlps
            a = qe
        else:
            if a >= 0x8000:
                self.a = a
                return mps  # no renormalization -> no estimation update
            if a < qe:  # conditional exchange: the LPS moved to the bottom
                bit = mps ^ 1
                st[i] = ((mps ^ switch) << 7) | nlps
            else:
                bit = mps
                st[i] = (sv & 0x80) | nmps
        # renormalize, shifting fresh code bits in (D.2.6)
        c, acc, n = self.c, self.acc, self.n
        while a < 0x8000:
            a <<= 1
            if n == 0:
                acc = self._byte()
                n = 8
            n -= 1
            c = (c << 1) | ((acc >> n) & 1)
        self.a, self.c, self.acc, self.n = a, c, acc, n
        return bit


class _ArithEncoder:
    """T.81 D.1 binary arithmetic encoder (the make_jpeg fixture
    half).  Mirrors :class:`_ArithDecoder`'s interval convention
    exactly; the byte-output stage handles carry propagation into the
    pending byte, stacked 0xFF bytes (which a carry converts to 0x00),
    deferred zero bytes (so trailing zeros can legally be dropped at
    flush), and 0x00-stuffing after every data 0xFF."""

    __slots__ = ("c", "a", "ct", "buffer", "sc", "zc", "out")

    def __init__(self) -> None:
        self.c = 0
        self.a = 0x10000
        self.ct = 11  # 11 shifts before the first byte leaves (3 spacer bits)
        self.buffer = -1  # pending output byte (-1: none yet)
        self.sc = 0  # stacked 0xFF bytes awaiting carry resolution
        self.zc = 0  # deferred 0x00 bytes
        self.out = bytearray()

    def _flush_zc(self) -> None:
        if self.zc:
            self.out += b"\x00" * self.zc
            self.zc = 0

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry: resolve into the pending byte; stacked 0xFFs become 0x00
            if self.buffer >= 0:
                self._flush_zc()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # might still be hit by a later carry
        else:
            # temp < 0xFF settles every pending byte before it
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zc()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_zc()
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        qe, nmps, nlps, switch = _ARITH_QE[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if bit != mps:
            if self.a >= qe:  # usual LPS: top sub-interval
                self.c += self.a
                self.a = qe
            # else conditional exchange: LPS keeps the bottom
            st[i] = ((mps ^ switch) << 7) | nlps
        else:
            if self.a >= 0x8000:
                return  # no renormalization -> no estimation update
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) | nmps
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a >= 0x8000:
                return

    def finish(self) -> bytes:
        """D.1.8 termination: pick the code value in [C, C+A) with the
        most trailing zeros, flush the registers, drop trailing zero
        bytes (the decoder regenerates them after the marker)."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # one final carry into the pending byte
            if self.buffer >= 0:
                self._flush_zc()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zc()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_zc()
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
        # final data bytes, only if not all zero
        if self.c & 0x7FFF800:
            self._flush_zc()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
        return bytes(self.out)


# Annex F statistical models.  Context layout inside the per-table
# statistics areas (Tables F.4/F.5): DC — 5 conditioning classes x 4
# decisions at 0..19, the shared X1..X15 magnitude-category chain at
# 20..34, magnitude bits at (category context + 14); AC — per-band-index
# contexts 3*(k-1)..3*(k-1)+2 (end-of-block, coefficient-nonzero,
# low magnitude), the two shared category chains at 189 (k <= Kx) and
# 217 (k > Kx).  DC conditioning (L, U) and AC conditioning Kx come
# from the DAC segment (defaults 0, 1 and 5 — F.1.4.4.1.2 / F.1.4.4.2).


def _arith_decode_dc(dec: "_ArithDecoder", dcst: bytearray, comp_state: list,
                     lo: int, up: int) -> int:
    """One DC difference (F.1.4.1 decode shape); ``comp_state`` is the
    component's mutable [conditioning_context, last_dc] pair."""
    base = comp_state[0]
    if dec.decode(dcst, base):
        sign = dec.decode(dcst, base + 1)
        stp = base + 2 + sign
        m = dec.decode(dcst, stp)
        if m:
            stp = 20  # X1
            while dec.decode(dcst, stp):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("corrupt arithmetic JPEG (DC magnitude)")
                stp += 1
        # conditioning class for the NEXT block's first decision
        if m < (1 << lo) >> 1:
            comp_state[0] = 0
        elif m > (1 << up) >> 1:
            comp_state[0] = 12 + 4 * sign
        else:
            comp_state[0] = 4 + 4 * sign
        v = m
        stp += 14
        mm = m >> 1
        while mm:
            if dec.decode(dcst, stp):
                v |= mm
            mm >>= 1
        v += 1
        comp_state[1] += -v if sign else v
    else:
        comp_state[0] = 0
    return comp_state[1]


def _arith_decode_ac(dec: "_ArithDecoder", acst: bytearray, fixed: bytearray,
                     zz, ss: int, se: int, al: int, kx: int) -> None:
    """AC band [ss, se] of one block (F.1.4.2 / G.2 first-scan shape);
    decoded values land point-transform-shifted into ``zz``."""
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(acst, base):
            return  # end-of-block / end-of-band
        while not dec.decode(acst, base + 1):
            base += 3
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic JPEG (AC run)")
        sign = dec.decode(fixed, 0)
        stp = base + 2
        m = dec.decode(acst, stp)
        if m and dec.decode(acst, stp):
            m = 2
            stp = 189 if k <= kx else 217
            while dec.decode(acst, stp):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("corrupt arithmetic JPEG (AC magnitude)")
                stp += 1
        v = m
        stp += 14
        mm = m >> 1
        while mm:
            if dec.decode(acst, stp):
                v |= mm
            mm >>= 1
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _arith_decode_ac_refine(dec: "_ArithDecoder", acst: bytearray,
                            fixed: bytearray, zz, ss: int, se: int,
                            al: int) -> None:
    """AC successive-approximation refinement (G.2.3): one correction
    bit per already-nonzero coefficient, newly significant ones arrive
    as +-1 << Al; the end-of-block decision is only coded past the
    PREVIOUS stage's last nonzero index."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex >= ss and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(acst, base):
            return  # end-of-band
        while True:
            cur = int(zz[k])
            if cur:
                if dec.decode(acst, base + 2):
                    zz[k] = cur + (m1 if cur < 0 else p1)
                break
            if dec.decode(acst, base + 1):
                zz[k] = m1 if dec.decode(fixed, 0) else p1
                break
            base += 3
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic JPEG (AC refine run)")
        k += 1


def _arith_encode_dc(enc: "_ArithEncoder", dcst: bytearray, comp_state: list,
                     lo: int, up: int, dc: int) -> None:
    """Encode twin of :func:`_arith_decode_dc` (F.1.4.1)."""
    v = dc - comp_state[1]
    base = comp_state[0]
    if v == 0:
        enc.encode(dcst, base, 0)
        comp_state[0] = 0
        return
    comp_state[1] = dc
    enc.encode(dcst, base, 1)
    if v > 0:
        enc.encode(dcst, base + 1, 0)
        sign = 0
    else:
        v = -v
        enc.encode(dcst, base + 1, 1)
        sign = 1
    stp = base + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(dcst, stp, 1)
        m = 1
        stp = 20
        v2 = v >> 1
        while v2:
            enc.encode(dcst, stp, 1)
            m <<= 1
            stp += 1
            v2 >>= 1
    enc.encode(dcst, stp, 0)
    if m < (1 << lo) >> 1:
        comp_state[0] = 0
    elif m > (1 << up) >> 1:
        comp_state[0] = 12 + 4 * sign
    else:
        comp_state[0] = 4 + 4 * sign
    stp += 14
    mm = m >> 1
    while mm:
        enc.encode(dcst, stp, 1 if (v & mm) else 0)
        mm >>= 1


def _arith_encode_ac(enc: "_ArithEncoder", acst: bytearray, fixed: bytearray,
                     zz, ss: int, se: int, al: int, kx: int) -> None:
    """Encode twin of :func:`_arith_decode_ac`; values are taken
    through the sign-preserving point transform |v| >> Al."""
    ke = se
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(acst, base, 0)  # not end-of-block yet
        v = int(zz[k])
        av = abs(v) >> al
        while av == 0:
            enc.encode(acst, base + 1, 0)
            base += 3
            k += 1
            v = int(zz[k])
            av = abs(v) >> al
        enc.encode(acst, base + 1, 1)
        enc.encode(fixed, 0, 1 if v < 0 else 0)
        stp = base + 2
        m = 0
        av -= 1
        if av:
            enc.encode(acst, stp, 1)
            m = 1
            v2 = av >> 1
            if v2:
                enc.encode(acst, stp, 1)
                m = 2
                stp = 189 if k <= kx else 217
                v2 >>= 1
                while v2:
                    enc.encode(acst, stp, 1)
                    m <<= 1
                    stp += 1
                    v2 >>= 1
        enc.encode(acst, stp, 0)
        stp += 14
        mm = m >> 1
        while mm:
            enc.encode(acst, stp, 1 if (av & mm) else 0)
            mm >>= 1
        k += 1
    if ke < se:
        enc.encode(acst, 3 * (k - 1), 1)  # end-of-block


def _arith_encode_ac_refine(enc: "_ArithEncoder", acst: bytearray,
                            fixed: bytearray, zz, ss: int, se: int,
                            al: int) -> None:
    """Encode twin of :func:`_arith_decode_ac_refine` (G.2.3)."""
    ke = se
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (abs(int(zz[kex])) >> (al + 1)) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(acst, base, 0)
        while True:
            v = int(zz[k])
            av = abs(v) >> al
            if av:
                if av >> 1:  # previously significant: one correction bit
                    enc.encode(acst, base + 2, av & 1)
                else:  # newly significant
                    enc.encode(acst, base + 1, 1)
                    enc.encode(fixed, 0, 1 if v < 0 else 0)
                break
            enc.encode(acst, base + 1, 0)
            base += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(acst, 3 * (k - 1), 1)  # end-of-band


def _jpeg_any_marker(data: bytes, pos: int) -> int:
    """Position of the next marker at or after ``pos`` INCLUDING
    restart markers — the arithmetic decoder's restart-boundary scan
    (remaining flush bytes and stuffed 0xFF 0x00 pairs are skipped)."""
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF:
            while p + 1 < len(data) and data[p + 1] == 0xFF:
                p += 1
            if p + 1 >= len(data):
                break
            if data[p + 1] != 0x00:
                return p
            p += 2
            continue
        p += 1
    raise ValueError("truncated JPEG stream after scan")


def _decode_jpeg_scan_arith(
    data: bytes,
    pos: int,
    comps,
    scomps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    progressive: bool,
    coefs,
    cgrid,
    dac_dc: dict,
    dac_ac: dict,
    dri: int,
    mcux: int,
    mcuy: int,
) -> int:
    """Arithmetic twin of :func:`_decode_jpeg_scan`: decode one
    entropy-coded scan into the coefficient buffers and return the
    position of the following marker.  Statistics areas, conditioning
    contexts and DC predictions reset at scan start and at every
    restart marker; the coder itself re-initializes after each RST."""
    if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("bad sequential JPEG scan header")
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("interleaved progressive AC scan")
        if ss > se or se > 63:
            raise ValueError("bad spectral band")
    by_cid = {cid: (h, v, tq) for cid, h, v, tq in comps}
    for cid, _, _ in scomps:
        if cid not in by_cid:
            raise ValueError("scan references unknown component")

    def _fresh():
        return (
            {td: bytearray(64) for _, td, _ in scomps},
            {ta: bytearray(256) for _, _, ta in scomps},
            bytearray((_ARITH_FIXED,)),
            {cid: [0, 0] for cid, _, _ in scomps},
        )

    dec = _ArithDecoder(data, pos)
    dc_stats, ac_stats, fixed, dc_state = _fresh()
    n_unit = 0
    rst = 0

    def _maybe_restart() -> None:
        nonlocal dec, dc_stats, ac_stats, fixed, dc_state, rst
        if dri and n_unit and n_unit % dri == 0:
            q = _jpeg_any_marker(data, dec.p)
            if not 0xD0 <= data[q + 1] <= 0xD7:
                raise ValueError("expected RST marker at restart interval")
            if data[q + 1] != 0xD0 + rst:
                raise ValueError("JPEG restart markers out of sequence")
            rst = (rst + 1) % 8
            dec = _ArithDecoder(data, q + 2)
            dc_stats, ac_stats, fixed, dc_state = _fresh()

    if len(scomps) > 1 or (progressive and ss == 0):
        # MCU-interleaved (sequential multi-component + DC scans)
        for my in range(mcuy):
            for mx in range(mcux):
                _maybe_restart()
                for cid, td, ta in scomps:
                    h, v, _ = by_cid[cid]
                    for by in range(v):
                        for bx in range(h):
                            zz = coefs[cid][my * v + by, mx * h + bx]
                            if not progressive:
                                lo, up = dac_dc.get(td, (0, 1))
                                zz[0] = _arith_decode_dc(
                                    dec, dc_stats[td], dc_state[cid], lo, up
                                )
                                _arith_decode_ac(
                                    dec, ac_stats[ta], fixed, zz, 1, 63, 0,
                                    dac_ac.get(ta, 5),
                                )
                            elif ah == 0:  # DC first
                                lo, up = dac_dc.get(td, (0, 1))
                                zz[0] = _arith_decode_dc(
                                    dec, dc_stats[td], dc_state[cid], lo, up
                                ) << al
                            else:  # DC refinement: one fixed-bin decision
                                if dec.decode(fixed, 0):
                                    zz[0] |= 1 << al
                n_unit += 1
    else:
        # single-component scan over the component's OWN block grid
        cid, td, ta = scomps[0]
        bh, bw = cgrid[cid]
        for by in range(bh):
            for bx in range(bw):
                _maybe_restart()
                zz = coefs[cid][by, bx]
                if not progressive:
                    lo, up = dac_dc.get(td, (0, 1))
                    zz[0] = _arith_decode_dc(
                        dec, dc_stats[td], dc_state[cid], lo, up
                    )
                    _arith_decode_ac(
                        dec, ac_stats[ta], fixed, zz, 1, 63, 0,
                        dac_ac.get(ta, 5),
                    )
                elif ah == 0:
                    _arith_decode_ac(
                        dec, ac_stats[ta], fixed, zz, ss, se, al,
                        dac_ac.get(ta, 5),
                    )
                else:
                    _arith_decode_ac_refine(
                        dec, ac_stats[ta], fixed, zz, ss, se, al
                    )
                n_unit += 1
    return _jpeg_next_marker(data, dec.p)
