"""Minimal pure-stdlib AVI (RIFF) container codec for MJPEG video.

AVI is a RIFF container (like WAV, ``extras/wav.py``) and Motion-JPEG frames
are plain baseline JPEGs (``extras/jpeg.py``), so a real video decode path
needs no codec libraries for this combination: parse the RIFF structure,
collect the ``00dc`` frame chunks from the ``movi`` list, and hand each one
to ``decode_jpeg``. This retires the video branch of the multimodal stub
for MJPEG-in-AVI — the one video format the container's stdlib can honestly
decode; inter-frame codecs (H.264/VP9/AV1) genuinely need external
libraries and still raise.

Encoder scope: a spec-valid minimal AVI (hdrl with avih + one vids/MJPG
stream, movi list of 00dc chunks) so tests can build real multi-frame
videos in-repo.
"""

from __future__ import annotations

import struct

RIFF_MAGIC = b"RIFF"
AVI_MAGIC = b"AVI "


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    width: int, height: int, jpeg_frames: list[bytes], fps: int = 10
) -> bytes:
    """Wrap already-encoded baseline JPEG frames as an MJPEG AVI."""
    if not jpeg_frames:
        raise ValueError("at least one frame required")
    usec_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        # dwFlags = 0: no idx1 chunk is written, so AVIF_HASINDEX (0x10)
        # must NOT be set — declaring an index that doesn't exist breaks
        # index-trusting parsers
        usec_per_frame, max_bytes * fps, 0, 0,
        len(jpeg_frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(jpeg_frames),
        max_bytes, 0xFFFFFFFF, 0, 0, 0, width & 0xFFFF, height & 0xFFFF,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in jpeg_frames))
    body = AVI_MAGIC + hdrl + movi
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an MJPEG AVI → (width, height, usec_per_frame, jpeg_frames).

    Walks the RIFF structure (unknown chunks skipped per spec, like the WAV
    decoder), reads geometry from ``avih``, and collects the compressed
    ``00dc``/``00db`` frame payloads from the ``movi`` list — each one a
    baseline JPEG for ``extras.jpeg.decode_jpeg``. Non-MJPEG streams raise.
    """
    if data[:4] != RIFF_MAGIC or data[8:12] != AVI_MAGIC:
        raise ValueError("not an AVI (bad RIFF/AVI signature)")
    (declared,) = struct.unpack("<I", data[4:8])
    if 8 + declared > len(data):
        raise ValueError("truncated AVI (payload shorter than declared RIFF size)")

    width = height = usec = None
    frames: list[bytes] = []
    handler = None

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, usec, handler
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + length
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                list_type = data[body_start : body_start + 4]
                walk(body_start + 4, body_end, in_movi or list_type == b"movi")
            elif fourcc == b"avih":
                if length < 40:
                    raise ValueError("avih too short")
                vals = struct.unpack("<10I", data[body_start : body_start + 40])
                usec = vals[0]
                width, height = vals[8], vals[9]
            elif fourcc == b"strh":
                if data[body_start : body_start + 4] == b"vids":
                    handler = data[body_start + 4 : body_start + 8]
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frame = data[body_start:body_end]
                if length == 0:
                    pass  # zero-size chunk = dropped/duplicate frame (spec-valid)
                elif frame[:2] != b"\xff\xd8":
                    raise ValueError("frame chunk is not a JPEG (MJPEG only)")
                else:
                    frames.append(frame)
            pos = body_end + (length & 1)  # chunks are word-aligned

    walk(12, 8 + declared, False)
    if handler is not None and handler not in (b"MJPG", b"mjpg"):
        raise ValueError(f"unsupported video codec {handler!r} (MJPEG only)")
    if width is None or not usec:
        # dwMicroSecPerFrame == 0 (rate only in strh) is out of scope here —
        # reject rather than divide by zero downstream
        raise ValueError("missing avih header or zero frame duration")
    if not frames:
        raise ValueError("no video frames in movi list")
    return width, height, usec, frames
