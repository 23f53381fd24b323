"""Minimal pure-stdlib PNG codec for the multimodal decode kernel.

The container bundles no image libraries (no Pillow), but PNG's baseline
format needs none: a PNG is zlib-deflated scanlines behind per-row byte
filters (PNG spec, RFC 2083). This module implements exactly the subset the
multimodal pipeline needs —

- ``decode_png``: 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced;
  all five scanline filters (None/Sub/Up/Average/Paeth) → raw pixel bytes.
- ``encode_png``: the test-side twin (choosable filter per image) so decode
  is exercised against images this repo generates deterministically.

Reference parity note: the reference CLI has no image path at all (its scope
is log text); this kernel exists for the 100 TB training-data-pipeline
mandate, replacing the round-3 ``NotImplementedError`` stub for image/png.
Audio/video kernels remain stubbed (their codecs genuinely need external
libraries).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples per pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline PNG → (width, height, channels, raw pixel bytes).

    Supports bit depth 8, color types {0, 2, 4, 6}, no interlacing — the
    shapes a data pipeline actually stores. Anything else raises
    ``ValueError`` (corrupt/unsupported), never returns garbage pixels.
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type} (palette needs PLTE)")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")

    stride = width * channels
    expected = (stride + 1) * height
    # bounded inflate: IHDR fixes the pixel-buffer size up front, so a
    # decompression bomb (tiny IDAT inflating to GBs) is rejected after at
    # most expected+1 bytes instead of materializing in executor memory
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or (d.flush() or d.unconsumed_tail):
        raise ValueError("pixel data size mismatch")
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = bytearray(raw[row_off + 1 : row_off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start >= 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                ul = out[prev_start + i - channels] if (prev_start >= 0 and i >= channels) else 0
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown scanline filter {ftype}")
        start = y * stride
        out[start : start + stride] = line
        prev_start = start
    return width, height, channels, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, channels: int, pixels: bytes, filter_type: int = 0
) -> bytes:
    """Encode raw 8-bit pixels as a valid PNG, applying ``filter_type``
    (0–4) to every scanline — lets tests drive each unfilter branch of
    ``decode_png`` with images generated in-repo."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw.extend(line)
        elif filter_type == 1:
            raw.extend(
                (line[i] - (line[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:
            raw.extend((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:
            raw.extend(
                (line[i] - (((line[i - channels] if i >= channels else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:
            raw.extend(
                (
                    line[i]
                    - _paeth(
                        line[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"unknown filter {filter_type}")
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )
