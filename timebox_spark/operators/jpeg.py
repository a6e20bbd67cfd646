"""Pure-numpy baseline JPEG codec (ITU T.81 baseline sequential DCT).

Closes the one documented multimodal limitation (the container ships no
DCT codec): ``decode_jpeg`` entropy-decodes any baseline-sequential
JPEG — multi-table DQT (8/16-bit), SOF0 with per-component sampling
factors (4:4:4 / 4:2:2 / 4:2:0), multiple DHT segments, restart
markers — then dequantizes, inverse-DCTs (vectorized matrix form over
all blocks), upsamples chroma, and converts YCbCr→RGB. ``encode_jpeg_
gray`` writes a 1-component baseline file with FLAT (all-ones)
quantization: on block-constant input the DCT is DC-only and integer,
so encode→decode round-trips BIT-EXACTLY — which is what lets the
DuckDB oracle predict the decoded pixel digest of a lossy format
arithmetically (see plans/suites.py q30).

The entropy coder is a per-symbol Python loop (Huffman is inherently
sequential); everything after it (dequant, IDCT, upsample, color) is
vectorized numpy over whole blocks. The reference engine has no media
operators at all (SURVEY §2.7) — this is north-star surface, not
parity.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> natural (row-major) coefficient index, T.81 fig 5
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# standard luminance Huffman tables (T.81 Annex K.3) — written by the
# encoder; the decoder always uses whatever tables the file declares
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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
    """Orthonormal 8x8 DCT-II matrix M: F = M f M^T, f = M^T F M."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2.0)
    return m


_M = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the canonical T.81 C.2 assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits value) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def encode_jpeg_gray(pixels) -> bytes:
    """Encode an (h, w) uint8 grayscale array as baseline JPEG with
    flat (all-ones) quantization and Annex-K luminance Huffman tables.
    Dimensions need not be multiples of 8 (edge blocks are replicated);
    on input that is constant within each 8x8 block the file decodes
    bit-exactly (DC-only blocks, integer coefficients).

    Roundtrip error bound (provable): flat quantization rounds each of
    the 64 orthonormal-DCT coefficients by at most 0.5, so the spatial
    reconstruction error is at most 0.5 * (sum_u |M[u,x]|)^2 = 3.49 for
    the 8-point DCT (sum_u |M[u,x]| = 2.6418 for every x), and after the
    decoder's final integer rounding at most **3** levels per pixel.
    Empirically the worst case found by fuzzing is 2 (e.g. 34x26 image,
    RandomState seed 749715326) — noise-like blocks compound the encode
    rint with the decode rint. A tighter +-1 bound is NOT true of
    baseline JPEG at any quality."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    s = padded.astype(np.float64) - 128.0
    blocks = s.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = np.einsum("ux,nxy,vy->nuv", _M, blocks, _M)
    q = np.rint(coeffs).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]

    dc_code = _huff_codes(DC_BITS, DC_VALS)
    ac_code = _huff_codes(AC_BITS, AC_VALS)
    bw_ = _BitWriter()
    prev_dc = 0
    for blk in q:
        size, extra = _magnitude(int(blk[0]) - prev_dc)
        prev_dc = int(blk[0])
        code, ln = dc_code[size]
        bw_.write(code, ln)
        if size:
            bw_.write(extra, size)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_code[0xF0]  # ZRL
                bw_.write(code, ln)
                run -= 16
            size, extra = _magnitude(v)
            code, ln = ac_code[(run << 4) | size]
            bw_.write(code, ln)
            bw_.write(extra, size)
            run = 0
        if last < 63:
            code, ln = ac_code[0x00]  # EOB
            bw_.write(code, ln)
    entropy = bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        )

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFDB, b"\x00" + bytes([1] * 64))  # DQT 0, flat
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += dht(0, 0, DC_BITS, DC_VALS)
    out += dht(1, 0, AC_BITS, AC_VALS)
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy + b"\xff\xd9"  # EOI
    return out


class _BitReader:
    """Entropy-segment bit reader: unstuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):  # truncated scan: feed zeros (lenient)
            self.marker = 0xD9
            self.acc <<= 8
            self.nbits += 8
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                self.marker = nxt  # restart/EOI reached mid-read
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def align_restart(self) -> None:
        """Consume the next restart marker and realign to a byte
        boundary (T.81 F.2.1.3.1). Works whether or not ``_fill``
        already ran into the marker: ``pos`` always points at or
        before the FF Dn pair."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG to an (h, w, 3) uint8 RGB
    array. Grayscale replicates to RGB; 3-component scans apply JFIF
    YCbCr→RGB with nearest-neighbor chroma upsampling. Progressive
    (SOF2) and arithmetic-coded files raise ValueError."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    while True:
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG (no SOS)")
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte before a marker
            pos -= 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        ln = struct.unpack_from(">H", b, pos)[0]
        if ln < 2:
            raise ValueError("bad JPEG segment length")
        payload = b[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT, possibly several tables per segment
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq:
                    tbl = np.frombuffer(payload, dtype=">u2", count=64, offset=p)
                    p += 128
                else:
                    tbl = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p)
                    p += 64
                qt[tq] = tbl.astype(np.float64)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            _prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", payload, 6 + 3 * i)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline-sequential JPEG is supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _huff_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            scan = []
            for i in range(ns):
                cid, tabs = struct.unpack_from("BB", payload, 1 + 2 * i)
                comp = next(c for c in comps if c["id"] == cid)
                comp["dc"] = huff[(0, tabs >> 4)]
                comp["ac"] = huff[(1, tabs & 0xF)]
                scan.append(comp)
            break
        # APPn / COM / others: skipped via the length field above

    if not comps or not h or not w:
        raise ValueError("missing SOF before SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)
        c["pred"] = 0

    br = _BitReader(b, pos)
    inv_zz = ZIGZAG  # zigzag position -> natural index
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            br.align_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in scan:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.float64)
                    size = _read_symbol(br, c["dc"])
                    diff = _extend(br.bits(size), size) if size else 0
                    c["pred"] += diff
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        sym = _read_symbol(br, c["ac"])
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 0xF
                        if size == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _extend(br.bits(size), size)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = blk
    # dequant + dezigzag + IDCT, vectorized over every block at once
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :]
        nat = np.zeros_like(deq)
        nat[:, inv_zz] = deq
        # f[x,y] = sum_uv M[u,x] * F[u,v] * M[v,y]  (f = M^T F M)
        f = np.einsum("ux,nuv,vy->nxy", _M, nat.reshape(-1, 8, 8), _M)
        plane = (
            f.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # nearest-neighbor upsample to full resolution, then crop
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )[:h, :w]
        planes.append(plane + 128.0)
    if len(planes) == 1:
        y = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bch], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
