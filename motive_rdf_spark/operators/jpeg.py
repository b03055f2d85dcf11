"""Baseline JPEG (ITU-T T.81) codec in pure numpy — the compressed
codec for the multimodal ``strict`` slot (VERDICT r4 item 7).

Everything here is from the public JPEG specification: marker/segment
layout (T.81 §B), Huffman entropy coding with the Annex K.3 typical
tables, zigzag ordering (Figure A.6), the 8x8 type-II DCT (A.3.3) and
byte stuffing (B.1.1.5). No external image library is used or needed.

Decoder scope (``decode_jpeg``): baseline sequential DCT (SOF0),
8-bit, grayscale or YCbCr with arbitrary sampling factors up to 2x2
(4:4:4, 4:2:2, 4:2:0 — chroma upsampled by replication), restart
markers (DRI), multiple DQT/DHT segments, APPn/COM skipping, and
trailing bytes after EOI ignored (real corpora carry trailing
garbage). Progressive (SOF2), arithmetic coding, and 12-bit raise
``NotImplementedError`` — the declared boundary.

Encoder scope (``encode_jpeg_gray``): single-component baseline
grayscale with a caller-supplied quantization table; used to
synthesize deterministic fixtures. With the all-ones quantization
table an image made of constant 8x8 tiles round-trips EXACTLY (each
block holds only its DC coefficient, which quantizes losslessly), so
oracle features of compressed fixtures stay closed-form.

Cited reference parity: the reference has no media pipeline at all —
this module belongs to the graft's training-data surface
(multimodal.py), not to motive-rdf semantics.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants (T.81 Annex K / Figure A.6)
# ---------------------------------------------------------------------------

#: zigzag scan order: ZIGZAG[i] = raster index of the i-th zigzag slot
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.3.1 typical luminance DC table: BITS (codes per length 1..16)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))

#: Annex K.3.2 typical luminance AC table
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """A[u,x] = 1/2 c(u) cos((2x+1)uπ/16) — orthogonal; F = A f Aᵀ is
    exactly the T.81 A.3.3 FDCT and f = Aᵀ F A its inverse."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


def _bit_size(v: int) -> int:
    """Category (SSSS) of a DC diff / AC amplitude."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder (grayscale fixtures)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per B.1.1.5


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def encode_jpeg_gray(
    img: np.ndarray, quant: np.ndarray | None = None, pad_to: int | None = None
) -> bytes:
    """Baseline grayscale JPEG of ``img`` (uint8, HxW). ``quant`` is a
    raster-order 8x8 table (default all ones = effectively lossless
    for block-constant content). ``pad_to`` appends zero bytes after
    EOI up to a fixed total size — decoders must ignore them — so
    fixture byte sizes are closed-form constants."""
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int64)
    quant = quant.astype(np.int64).reshape(8, 8)
    h, w = img.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    # edge-replicate to full blocks
    padded = np.pad(img.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")

    dc_codes = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw_out = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _A @ block @ _A.T
            q = np.round(coef / quant).astype(np.int64)
            zz = q.ravel()[ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            size = _bit_size(diff)
            code, length = dc_codes[size]
            bw_out.write(code, length)
            if size:
                amp = diff if diff >= 0 else diff + (1 << size) - 1
                bw_out.write(amp, size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for i in range(1, 64):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw_out.write(c, ln)
                    run -= 16
                size = _bit_size(v)
                c, ln = ac_codes[(run << 4) | size]
                bw_out.write(c, ln)
                amp = v if v >= 0 else v + (1 << size) - 1
                bw_out.write(amp, size)
                run = 0
            if last_nz < 63:
                c, ln = ac_codes[0x00]  # EOB
                bw_out.write(c, ln)
    bw_out.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_quant = quant.ravel()[ZIGZAG]
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFDB, bytes([0x00]) + bytes(int(x) & 0xFF for x in zz_quant))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw_out.out
    out += b"\xff\xd9"  # EOI
    if pad_to is not None:
        if len(out) > pad_to:
            raise ValueError(f"encoded size {len(out)} exceeds pad_to {pad_to}")
        out += b"\x00" * (pad_to - len(out))
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    """LUT-free canonical Huffman decoder (T.81 F.2.2.3 DECODE)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at any
    real marker (leaving it for the caller)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # a marker: feed 1-bits like the spec's padding rule
                self._acc = (self._acc << 8) | 0xFF
                self._nbits += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = self.bit()
        length = 1
        while code > table.maxcode[length]:
            code = (code << 1) | self.bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: huffman code overflow")
        return table.vals[table.valptr[length] + code - table.mincode[length]]

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker (F.2.1.3.1)."""
        self._nbits = 0
        self._acc = 0
        if self.buf[self.pos] == 0xFF and 0xD0 <= self.buf[self.pos + 1] <= 0xD7:
            if (self.buf[self.pos + 1] & 7) != (n & 7):
                raise ValueError("corrupt JPEG: restart marker out of order")
            self.pos += 2


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map received bits to signed amplitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 (H, W, C), C = 1 (grayscale) or
    3 (RGB via JFIF YCbCr). Raises ``NotImplementedError`` for
    progressive/arithmetic/12-bit streams and ``ValueError`` for
    structurally corrupt data. Bytes after EOI are ignored."""
    buf = payload
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) ; comps = list of (cid, hs, vs, tq)

    while True:
        if pos + 1 >= len(buf):
            raise ValueError("truncated JPEG: no SOS/EOI")
        if buf[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", buf, pos)
        body = buf[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                o += 1
                if pq:
                    vals = np.frombuffer(body[o : o + 128], dtype=">u2").astype(np.int64)
                    o += 128
                else:
                    vals = np.frombuffer(body[o : o + 64], dtype=np.uint8).astype(np.int64)
                    o += 64
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = vals  # de-zigzag to raster
                qtabs[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                o += 17 + nv
                (ac_tabs if tc else dc_tabs)[th] = _HuffTable(bits, vals)
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(
                buf, pos, frame, scan, qtabs, dc_tabs, ac_tabs, restart_interval
            )
        # else: APPn / COM / others — skipped


def _decode_scan(buf, pos, frame, scan, qtabs, dc_tabs, ac_tabs, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    rdr = _BitReader(buf, pos)
    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                rdr.align_and_expect_rst(rst)
                rst += 1
                pred = {cid: 0 for cid in pred}
            for cid, tdc, tac in scan:
                hs, vs, tq = by_id[cid]
                quant = qtabs[tq]
                for v in range(vs):
                    for hh in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        s = rdr.decode(dc_tabs[tdc])
                        diff = _extend(rdr.receive(s), s)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        i = 1
                        while i < 64:
                            rs = rdr.decode(ac_tabs[tac])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    i += 16  # ZRL
                                    continue
                                break  # EOB
                            i += r
                            if i > 63:
                                raise ValueError("corrupt JPEG: AC index overflow")
                            zz[i] = _extend(rdr.receive(s), s)
                            i += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * quant.ravel()[ZIGZAG]
                        block = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + hh) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1

    # crop/upsample to full resolution
    out_planes = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        img = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return img[:, :, None]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
