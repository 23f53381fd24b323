"""Minimal pure-stdlib WAV (RIFF PCM) codec for the multimodal decode kernel.

PCM WAV is a container, not a codec: RIFF chunks with a ``fmt `` header and
raw little-endian samples in ``data`` (no compression), so — like the PNG
path in ``extras/png.py`` — decoding needs only ``struct``. This retires the
audio branch of the round-3 ``NotImplementedError`` stub for uncompressed
PCM; compressed audio (MP3/AAC/…) and video genuinely need codec libraries
absent from this container and stay stubbed.

Reference parity note: the reference CLI has no audio path (its scope is log
text); this exists for the 100 TB training-data-pipeline mandate.
"""

from __future__ import annotations

import struct

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"
PCM_FORMAT = 1


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PCM WAV → (n_channels, sample_rate, bits_per_sample, frames).

    ``frames`` is the raw interleaved little-endian PCM byte stream from the
    ``data`` chunk. Unknown chunks (LIST/INFO/fact/…) are skipped, as the
    RIFF spec requires. Non-PCM encodings raise ``ValueError``.
    """
    if data[:4] != RIFF_MAGIC or data[8:12] != WAVE_MAGIC:
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if ctype == b"fmt ":
            if fmt is not None:
                # a second fmt chunk would silently redefine the geometry of
                # frames already accepted — reject, matching the decoder's
                # never-returns-garbage posture
                raise ValueError("duplicate fmt chunk")
            if length < 16:
                raise ValueError("fmt chunk too short")
            audio_format, n_channels, sample_rate, _byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != PCM_FORMAT:
                raise ValueError(f"unsupported WAV encoding {audio_format} (PCM only)")
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported bit depth {bits}")
            if block_align != n_channels * (bits // 8):
                raise ValueError("block alignment inconsistent with channels/bits")
            fmt = (n_channels, sample_rate, bits, block_align)
        elif ctype == b"data":
            if frames is not None:
                # letting a later data chunk win would make byte-identical
                # audio content hash differently depending on chunk layout
                raise ValueError("duplicate data chunk")
            frames = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned (pad byte)
    if fmt is None or frames is None:
        raise ValueError("missing fmt or data chunk")
    n_channels, sample_rate, bits, block_align = fmt
    if len(frames) % block_align != 0:
        raise ValueError("data chunk is not a whole number of frames")
    return n_channels, sample_rate, bits, frames


def encode_wav(
    n_channels: int, sample_rate: int, samples: list[int], extra_chunks: bytes = b""
) -> bytes:
    """Encode 16-bit PCM samples (interleaved ints) as a valid WAV.
    ``extra_chunks`` (already-serialized RIFF chunks) are inserted before
    ``data`` — lets tests prove the decoder skips unknown chunks."""
    frames = struct.pack(f"<{len(samples)}h", *samples)
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", PCM_FORMAT, n_channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += extra_chunks
    chunks += b"data" + struct.pack("<I", len(frames)) + frames + (b"\x00" if len(frames) & 1 else b"")
    return RIFF_MAGIC + struct.pack("<I", 4 + len(chunks)) + WAVE_MAGIC + chunks
