"""Minimal pure-stdlib baseline JPEG (JFIF) codec for the multimodal kernel.

Implements the public ITU-T T.81 baseline sequential process with no
dependencies: canonical Huffman coding, 8x8 DCT/IDCT (separable float),
zigzag, quantization, YCbCr color transform, and chroma subsampling on
decode (nearest-neighbor upsample). This retires the JPEG branch of the
multimodal ``NotImplementedError`` stub the same way ``extras/png.py`` and
``extras/wav.py`` retired the PNG/audio branches.

Decoder scope: baseline sequential (SOF0), 8-bit, grayscale or YCbCr,
sampling factors up to 4, restart markers honored — i.e. the overwhelming
majority of real-world JPEGs. Progressive (SOF2) and arithmetic coding
raise ``ValueError`` (never garbage).

Encoder scope: baseline 4:4:4 (or grayscale) with a SINGLE quality-scaled
quantization table and self-describing canonical Huffman tables written to
DHT — any conformant decoder reads the output; it exists so tests can
round-trip pixels through real entropy-coded scans generated in-repo.

Reference parity note: the reference CLI has no image path (its scope is
log text; package.json:4); this exists for the 100 TB training-data
mandate, like the PNG codec.
"""

from __future__ import annotations

import math
import struct

SOI = b"\xff\xd8"

# natural position of the i-th coefficient in zigzag order (T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _dct_2d(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x * 8 + y] * _COS[u][x] * _COS[v][y]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct_2d(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += _C[u] * _C[v] * coef[u * 8 + v] * _COS[u][x] * _COS[v][y]
            out[x * 8 + y] = 0.25 * s
    return out


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the DHT BITS/HUFFVAL lists (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the bit-by-bit decoder."""
    return {(L, c): sym for sym, (c, L) in _canonical_codes(bits, values).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # a real marker inside the scan (EOI / RSTn seen early):
                # treat as truncation — callers handle RST via sync()
                raise ValueError("marker inside entropy-coded segment")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff_decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.nbits = 0
        while self.pos + 1 < len(self.data) and not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError("missing restart marker")
        if self.data[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError("restart marker out of sequence")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _category(v: int) -> int:
    return abs(v).bit_length()


def quality_table(quality: int = 90) -> list[int]:
    """Quality-scaled quantization table (IJG scaling over the T.81 Annex K
    luminance table — public spec constants)."""
    base = [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((b * scale + 50) // 100, 1), 255) for b in base]


# encoder Huffman tables: balanced canonical codes, self-described in DHT
# (12 DC categories at 4 bits; all 162 AC run/size symbols at 8 bits)
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_AC_BITS = [0] * 7 + [len(_ENC_AC_VALS)] + [0] * 8


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[float, float, float]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return y, cb, cr


def _clamp(v: float) -> int:
    return 0 if v < 0 else 255 if v > 255 else int(v)


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 90,
    subsample: bool = False,
) -> bytes:
    """Encode 8-bit pixels (grayscale or interleaved RGB) as a baseline
    sequential JPEG: one quality-scaled quant table, canonical Huffman
    tables written to DHT, 4:4:4 by default or 4:2:0 chroma subsampling
    (2x2-mean downsample, interleaved MCUs) with ``subsample=True``."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    qt = quality_table(quality)
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    # full-resolution component planes in YCbCr (or the single gray plane)
    n = width * height
    if channels == 1:
        full = [[float(p) for p in pixels]]
        factors = [(1, 1)]
    else:
        full = [[0.0] * n, [0.0] * n, [0.0] * n]
        for i in range(n):
            y, cb, cr = _rgb_to_ycbcr(
                pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            )
            full[0][i], full[1][i], full[2][i] = y, cb, cr
        factors = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
    maxh = max(f[0] for f in factors)
    maxv = max(f[1] for f in factors)

    # per-component planes at their sampled resolution (mean downsample)
    comps = []
    for (fh, fv), plane in zip(factors, full):
        cw = (width * fh + maxh - 1) // maxh
        ch = (height * fv + maxv - 1) // maxv
        if (fh, fv) == (maxh, maxv):
            comps.append((fh, fv, cw, ch, plane, width, height))
            continue
        sx, sy = maxh // fh, maxv // fv
        down = [0.0] * (cw * ch)
        for cy in range(ch):
            for cx in range(cw):
                total = 0.0
                cnt = 0
                for dy in range(sy):
                    for dx in range(sx):
                        px = min(cx * sx + dx, width - 1)
                        py = min(cy * sy + dy, height - 1)
                        total += plane[py * width + px]
                        cnt += 1
                down[cy * cw + cx] = total / cnt
        comps.append((fh, fv, cw, ch, down, cw, ch))

    w = _BitWriter()
    preds = [0] * len(comps)
    mcux = (width + 8 * maxh - 1) // (8 * maxh)
    mcuy = (height + 8 * maxv - 1) // (8 * maxv)

    def emit_block(ci: int, plane, pw: int, ph: int, ox: int, oy: int) -> None:
        block = []
        for yy in range(8):
            sy2 = min(oy + yy, ph - 1)
            for xx in range(8):
                sx2 = min(ox + xx, pw - 1)
                block.append(plane[sy2 * pw + sx2] - 128.0)
        coef = _dct_2d(block)
        quant = []
        for i in range(64):
            v = coef[ZIGZAG[i]] / qt[i]
            quant.append(int(v + 0.5) if v >= 0 else -int(-v + 0.5))
        diff = quant[0] - preds[ci]
        preds[ci] = quant[0]
        s = _category(diff)
        code, length = dc_codes[s]
        w.write(code, length)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = max((i for i in range(1, 64) if quant[i]), default=0)
        for i in range(1, last_nz + 1):
            if quant[i] == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                w.write(code, length)
                run -= 16
            s = _category(quant[i])
            code, length = ac_codes[(run << 4) | s]
            w.write(code, length)
            v = quant[i]
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            w.write(code, length)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (fh, fv, _cw, _ch, plane, pw, ph) in enumerate(comps):
                for by in range(fv):
                    for bx in range(fh):
                        emit_block(
                            ci, plane, pw, ph,
                            (mx * fh + bx) * 8, (my * fv + by) * 8,
                        )
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(SOI)
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00]) + bytes(qt))
    ncomp = len(comps)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci, (fh, fv, *_rest) in enumerate(comps):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])  # shared quant table 0
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS))
    sos = bytes([ncomp]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline sequential JPEG → (width, height, channels, pixels)
    with channels 1 (gray) or 3 (interleaved RGB). General baseline
    decoder: parses DQT/DHT/DRI from the stream, honors sampling factors
    (nearest-neighbor chroma upsample) and restart markers. Progressive /
    arithmetic / 12-bit raise ValueError."""
    if data[:2] != SOI:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before scan")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        pos += seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                prec_id = body[b]
                if prec_id >> 4:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                qtables[prec_id & 0x0F] = list(body[b + 1 : b + 65])
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc_th = body[b]
                bits = list(body[b + 1 : b + 17])
                nvals = sum(bits)
                vals = list(body[b + 17 : b + 17 + nvals])
                htables[(tc_th >> 4, tc_th & 0x0F)] = _decode_table(bits, vals)
                b += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (width, height, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tables = {}
            for c in range(ns):
                cid, td_ta = body[1 + 2 * c : 3 + 2 * c]
                scan_tables[cid] = (td_ta >> 4, td_ta & 0x0F)
            break
        # else: APPn / COM / unknown — skipped per spec
    width, height, comps = frame
    if len(comps) not in (1, 3):
        raise ValueError(f"unsupported component count {len(comps)}")
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 4 and 1 <= c["v"] <= 4 for c in comps):
        raise ValueError("unsupported sampling factors")
    mcux = (width + 8 * maxh - 1) // (8 * maxh)
    mcuy = (height + 8 * maxv - 1) // (8 * maxv)
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append([0.0] * (pw * ph))

    r = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst_count = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                r.sync_restart(rst_count)
                rst_count = (rst_count + 1) & 7
                preds = [0] * len(comps)
            mcu_index += 1
            for ci, c in enumerate(comps):
                td, ta = scan_tables[c["id"]]
                dc_t = htables.get((0, td))
                ac_t = htables.get((1, ta))
                qt = qtables.get(c["tq"])
                if dc_t is None or ac_t is None or qt is None:
                    raise ValueError("missing Huffman/quant table for scan")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        s = r.huff_decode(dc_t)
                        diff = _extend(r.receive(s), s) if s else 0
                        preds[ci] += diff
                        zz = [0] * 64
                        zz[0] = preds[ci] * qt[0]
                        k = 1
                        while k < 64:
                            rs = r.huff_decode(ac_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            zz[k] = _extend(r.receive(size), size) * qt[k]
                            k += 1
                        coef = [0.0] * 64
                        for i in range(64):
                            coef[ZIGZAG[i]] = float(zz[i])
                        block = _idct_2d(coef)
                        pw = mcux * 8 * c["h"]
                        oy = (my * c["v"] + by) * 8
                        ox = (mx * c["h"] + bx) * 8
                        plane = planes[ci]
                        for yy in range(8):
                            row = (oy + yy) * pw + ox
                            for xx in range(8):
                                plane[row + xx] = block[yy * 8 + xx] + 128.0
    if len(comps) == 1:
        pw = mcux * 8 * comps[0]["h"]
        out = bytearray(width * height)
        for y in range(height):
            for x in range(width):
                out[y * width + x] = _clamp(planes[0][y * pw + x] + 0.5)
        return width, height, 1, bytes(out)
    out = bytearray(width * height * 3)
    pws = [mcux * 8 * c["h"] for c in comps]
    for y in range(height):
        for x in range(width):
            yy = planes[0][(y * comps[0]["v"] // maxv) * pws[0] + (x * comps[0]["h"] // maxh)]
            cb = planes[1][(y * comps[1]["v"] // maxv) * pws[1] + (x * comps[1]["h"] // maxh)]
            cr = planes[2][(y * comps[2]["v"] // maxv) * pws[2] + (x * comps[2]["h"] // maxh)]
            i = (y * width + x) * 3
            out[i] = _clamp(yy + 1.402 * (cr - 128) + 0.5)
            out[i + 1] = _clamp(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
            out[i + 2] = _clamp(yy + 1.772 * (cb - 128) + 0.5)
    return width, height, 3, bytes(out)
