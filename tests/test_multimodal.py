"""Multimodal binary-column plumbing (decode stubbed; Spark shape real)."""

import pytest
from pyspark.sql import functions as F

from log_parser_cli_spark.extras.multimodal import (
    extract_features,
    frame_sample_plan,
    make_fake_assets,
)


def test_feature_extraction_shapes(spark):
    assets = make_fake_assets(spark, n=32)
    feats = extract_features(spark, assets, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 32
    assert "payload" not in feats.columns  # binary column pruned from output
    assert all(r.n_bytes > 0 and len(r.phash) == 16 and r.decoded for r in rows)
    # deterministic across runs
    again = {r.asset_id: r.phash for r in extract_features(spark, assets, True).collect()}
    assert again == {r.asset_id: r.phash for r in rows}


def test_payload_embeddings_feed_similarity_ops(spark):
    """Multimodal → embedding → near-dup composition: payload-derived unit
    vectors run through the SAME LSH-candidate + cosine-verify plan as the
    embeddings table; exact duplicate payloads are found with sim 1.0."""
    import pyspark.sql.functions as F

    from log_parser_cli_spark.extras.multimodal import payload_embeddings
    from log_parser_cli_spark.extras.similarity import cosine_pairs, rhp_candidates

    assets = make_fake_assets(spark, n=24)
    # duplicate two payloads under new asset ids
    dups = assets.filter(F.col("asset_id").isin("asset-000003", "asset-000007")).withColumn(
        "asset_id", F.concat(F.lit("dup-"), "asset_id")
    )
    emb = payload_embeddings(spark, assets.unionByName(dups)).withColumn(
        "vec_id", F.abs(F.hash("asset_id"))
    )
    rows = {r.asset_id: (r.vec_id, list(r.embedding)) for r in emb.collect()}
    # unit vectors, deterministic
    for _aid, (_vid, v) in rows.items():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5
    assert rows["asset-000003"][1] == rows["dup-asset-000003"][1]

    cands = rhp_candidates(emb, dim=16, n_planes=60, rows_per_band=3)
    pairs = cosine_pairs(emb, threshold=0.999, candidates=cands).collect()
    found = {frozenset((r.a, r.b)) for r in pairs}
    expect = {
        frozenset((rows["asset-000003"][0], rows["dup-asset-000003"][0])),
        frozenset((rows["asset-000007"][0], rows["dup-asset-000007"][0])),
    }
    assert expect <= found


def test_unknown_payload_decode_is_stubbed(spark):
    """Compressed-audio/video kernels still need external codecs: payloads
    with no PNG/JPEG/WAV signature under fake_decode=False raise instead of
    returning garbage."""
    assets = make_fake_assets(spark, n=4)  # md5-noise payloads, no known magic
    with pytest.raises(Exception, match="NotImplementedError|PNG"):
        extract_features(spark, assets, fake_decode=False).collect()


def test_png_codec_roundtrip_all_filters_and_channels():
    """The stdlib PNG codec round-trips every scanline filter (0–4) and
    every supported channel count (grey, grey+alpha, RGB, RGBA)."""
    from log_parser_cli_spark.extras.png import decode_png, encode_png

    w, h = 6, 4
    for c in (1, 2, 3, 4):
        pixels = bytes(
            ((x * 41 + y * 23 + ch * 7) & 0xFF)
            for y in range(h)
            for x in range(w)
            for ch in range(c)
        )
        for ft in range(5):
            assert decode_png(encode_png(w, h, c, pixels, filter_type=ft)) == (w, h, c, pixels)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" * 32)


def test_real_png_decode_hashes_pixels_not_bytes(spark):
    """fake_decode=False runs the REAL decode kernel: a known image
    byte-checks against its raw pixels, and two different encodings of the
    same image (filter 0 vs Paeth) collapse to ONE phash — impossible when
    hashing raw payload bytes."""
    import hashlib

    from log_parser_cli_spark.extras.multimodal import ASSET_SCHEMA
    from log_parser_cli_spark.extras.png import encode_png

    w, h, c = 6, 4, 3
    pixels = bytes(
        ((x * 40 + y * 20 + ch * 7) & 0xFF) for y in range(h) for x in range(w) for ch in range(c)
    )
    p0 = encode_png(w, h, c, pixels, filter_type=0)
    p4 = encode_png(w, h, c, pixels, filter_type=4)
    assert p0 != p4  # different bytes on disk...
    assets = spark.createDataFrame(
        [
            ("png-0", bytearray(p0), "image/png", w, h, 0),
            ("png-4", bytearray(p4), "image/png", w, h, 0),
        ],
        ASSET_SCHEMA,
    )
    feats = {
        r.asset_id: r for r in extract_features(spark, assets, fake_decode=False).collect()
    }
    # the hashed content is dimension-prefixed: same raster bytes under
    # transposed dimensions (2x3 vs 3x2) must not collide
    import struct

    expect = hashlib.md5(struct.pack(">IIB", w, h, c) + pixels).hexdigest()[:16]
    assert feats["png-0"].phash == expect  # byte-checked against known pixels
    assert feats["png-4"].phash == expect  # ...same decoded-content hash
    assert feats["png-0"].decoded and feats["png-0"].n_bytes == len(p0)


def test_frame_sample_plan_no_payload_scan(spark):
    assets = make_fake_assets(spark, n=16)
    plan_df = frame_sample_plan(assets, every_ms=500)
    rows = plan_df.collect()
    videos = [r for r in assets.collect() if r.mime.startswith("video/")]
    expected = sum((r.duration_ms + 499) // 500 for r in videos)
    assert len(rows) == expected
    # the physical plan must not read the payload column
    assert "payload" not in plan_df.columns


def test_wav_codec_roundtrip_and_chunk_skipping():
    """The stdlib WAV codec round-trips PCM frames and skips unknown RIFF
    chunks (LIST/INFO) per spec; non-PCM encodings are rejected."""
    import struct

    from log_parser_cli_spark.extras.wav import decode_wav, encode_wav

    samples = [((i * 2749) % 65536) - 32768 for i in range(400)]  # 2ch x 200 frames
    wav = encode_wav(2, 16000, samples)
    n_ch, rate, bits, frames = decode_wav(wav)
    assert (n_ch, rate, bits) == (2, 16000, 16)
    assert frames == struct.pack("<400h", *samples)
    # unknown chunk before data is skipped, frames unchanged
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    assert decode_wav(encode_wav(2, 16000, samples, extra_chunks=extra))[3] == frames
    bad = bytearray(wav)
    bad[20:22] = struct.pack("<H", 3)  # audio_format = 3 (IEEE float)
    with pytest.raises(ValueError, match="PCM only"):
        decode_wav(bytes(bad))
    # duplicate data/fmt chunks are rejected, not silently last-one-wins —
    # otherwise the decoded-content phash depends on chunk layout (r4 ADVICE)
    one_frame = struct.pack("<h", 7)
    dup_data = b"data" + struct.pack("<I", 2) + one_frame
    with pytest.raises(ValueError, match="duplicate data"):
        decode_wav(encode_wav(1, 8000, [1, 2], extra_chunks=dup_data))
    fmt_body = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    dup_fmt = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    with pytest.raises(ValueError, match="duplicate fmt"):
        decode_wav(encode_wav(1, 8000, [1, 2], extra_chunks=dup_fmt))


def test_real_wav_decode_hashes_frames_not_bytes(spark):
    """fake_decode=False decodes WAV containers: the same PCM frames under
    different container bytes (extra RIFF chunk) collapse to ONE phash."""
    import hashlib
    import struct

    from log_parser_cli_spark.extras.multimodal import ASSET_SCHEMA
    from log_parser_cli_spark.extras.wav import encode_wav

    samples = [((i * 997) % 65536) - 32768 for i in range(320)]
    w0 = encode_wav(1, 8000, samples)
    w1 = encode_wav(
        1, 8000, samples, extra_chunks=b"LIST" + struct.pack("<I", 4) + b"INFO"
    )
    assert w0 != w1
    assets = spark.createDataFrame(
        [
            ("wav-0", bytearray(w0), "audio/wav", 0, 0, 40),
            ("wav-1", bytearray(w1), "audio/wav", 0, 0, 40),
        ],
        ASSET_SCHEMA,
    )
    feats = {
        r.asset_id: r for r in extract_features(spark, assets, fake_decode=False).collect()
    }
    expect = hashlib.md5(
        struct.pack(">HIH", 1, 8000, 16) + struct.pack("<320h", *samples)
    ).hexdigest()[:16]
    assert feats["wav-0"].phash == expect
    assert feats["wav-1"].phash == expect


def _gradient_pixels(w, h):
    """Smooth 2-D gradient — a deterministic 'photo-like' grayscale image."""
    return bytes(((3 * x + 5 * y) * 255 // (3 * (w - 1) + 5 * (h - 1))) & 0xFF
                 for y in range(h) for x in range(w))


def test_phash64_is_perceptual_not_exact(spark):
    """Round-4 verdict #4: the 64-bit average-hash must cluster (a) a
    re-encoding of the same pixels at Hamming 0 and (b) a slightly-perturbed
    image within a small radius, while a genuinely different image stays far
    — exactly what the old md5-of-decoded-bytes phash could not do."""
    from log_parser_cli_spark.extras.multimodal import ASSET_SCHEMA, image_near_dup_pairs
    from log_parser_cli_spark.extras.png import encode_png

    w, h = 32, 32
    base = bytearray(_gradient_pixels(w, h))
    # (b) small perturbation: nudge a handful of pixels by +4 brightness
    pert = bytearray(base)
    for i in range(0, 40, 4):
        pert[i * 13 % len(pert)] = min(255, pert[i * 13 % len(pert)] + 4)
    # (c) genuinely different content: inverted checkerboard-ish texture
    other = bytes((255 - base[i]) if ((i // w) + i) % 2 else base[i] for i in range(len(base)))

    assets = spark.createDataFrame(
        [
            ("img-base", bytearray(encode_png(w, h, 1, bytes(base), filter_type=0)), "image/png", w, h, 0),
            ("img-reenc", bytearray(encode_png(w, h, 1, bytes(base), filter_type=4)), "image/png", w, h, 0),
            ("img-pert", bytearray(encode_png(w, h, 1, bytes(pert), filter_type=2)), "image/png", w, h, 0),
            ("img-other", bytearray(encode_png(w, h, 1, other, filter_type=0)), "image/png", w, h, 0),
        ],
        ASSET_SCHEMA,
    )
    feats = extract_features(spark, assets, fake_decode=False)
    by_id = {r.asset_id: r for r in feats.collect()}

    def hamming(a, b):
        return bin((by_id[a].phash64 ^ by_id[b].phash64) & ((1 << 64) - 1)).count("1")

    assert by_id["img-reenc"].phash64 == by_id["img-base"].phash64  # re-encode: 0
    assert 0 < hamming("img-base", "img-pert") <= 6  # near-dup within radius
    assert hamming("img-base", "img-other") > 6  # distinct stays out
    assert hamming("img-pert", "img-other") > 6

    # the banded generator clusters exactly the near-dups
    pairs = {
        (r.asset_a, r.asset_b)
        for r in image_near_dup_pairs(feats, max_hamming=6).collect()
    }
    assert ("img-base", "img-pert") in pairs
    assert ("img-base", "img-reenc") in pairs
    assert not any("img-other" in p for p in pairs)


def test_phash64_survives_brightness_shift(spark):
    """A global +8 brightness shift changes EVERY byte (exact hash moves) but
    barely moves block means relative to their mean — phash64 stays within a
    tiny radius. The mean-relative construction is what buys this."""
    from log_parser_cli_spark.extras.multimodal import ASSET_SCHEMA
    from log_parser_cli_spark.extras.png import encode_png

    w, h = 24, 24
    base = _gradient_pixels(w, h)
    bright = bytes(min(255, b + 8) for b in base)
    assets = spark.createDataFrame(
        [
            ("a", bytearray(encode_png(w, h, 1, base)), "image/png", w, h, 0),
            ("b", bytearray(encode_png(w, h, 1, bright)), "image/png", w, h, 0),
        ],
        ASSET_SCHEMA,
    )
    by_id = {r.asset_id: r for r in extract_features(spark, assets, fake_decode=False).collect()}
    assert by_id["a"].phash != by_id["b"].phash  # exact hash: every byte moved
    d = bin((by_id["a"].phash64 ^ by_id["b"].phash64) & ((1 << 64) - 1)).count("1")
    assert d <= 4  # perceptual hash: barely moved


def test_jpeg_codec_roundtrip_and_rejections():
    """The stdlib baseline JPEG codec: flat images round-trip exactly
    (DC-only blocks), smooth content stays within small error at q95 for
    gray / RGB 4:4:4 / RGB 4:2:0 (the chroma-upsample decode path), and
    non-baseline streams are rejected, never garbage."""
    import struct

    from log_parser_cli_spark.extras.jpeg import decode_jpeg, encode_jpeg

    w, h = 20, 14
    flat = bytes([128] * (w * h))
    assert decode_jpeg(encode_jpeg(w, h, 1, flat))[3] == flat  # exact

    grad = bytes(((3 * x + 5 * y) * 255 // (3 * (w - 1) + 5 * (h - 1))) & 0xFF
                 for y in range(h) for x in range(w))
    got = decode_jpeg(encode_jpeg(w, h, 1, grad, quality=95))
    assert got[:3] == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(got[3], grad)) <= 3

    rgb = bytes(
        [min(255, 40 + 6 * x + 2 * y), min(255, 30 + 3 * x + 5 * y),
         min(255, 60 + 2 * x + 4 * y)][c]
        for y in range(h) for x in range(w) for c in range(3)
    )
    for sub in (False, True):
        dw, dh, dc, px = decode_jpeg(encode_jpeg(w, h, 3, rgb, quality=95, subsample=sub))
        assert (dw, dh, dc) == (w, h, 3)
        assert max(abs(a - b) for a, b in zip(px, rgb)) <= (4 if sub else 2)

    # odd dimensions exercise the MCU edge clamp on both axes
    j = encode_jpeg(9, 11, 3, rgb[: 9 * 11 * 3], quality=90, subsample=True)
    assert decode_jpeg(j)[:3] == (9, 11, 3)

    # progressive (SOF2) is rejected, not mis-decoded
    base = bytearray(encode_jpeg(w, h, 1, flat))
    sof0 = base.find(b"\xff\xc0")
    base[sof0 + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(base))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" * 16)


def test_jpeg_decode_skips_metadata_segments(spark):
    """An APP1 (EXIF-style) segment injected into an existing JPEG changes
    the file bytes but not the scan — the decoded-content phash and the
    perceptual phash64 are both unchanged."""
    import struct

    from log_parser_cli_spark.extras.jpeg import encode_jpeg
    from log_parser_cli_spark.extras.multimodal import ASSET_SCHEMA

    w, h = 16, 16
    grad = _gradient_pixels(w, h)
    j0 = encode_jpeg(w, h, 1, grad, quality=90)
    app1 = b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00ab"
    j1 = j0[:2] + app1 + j0[2:]  # insert right after SOI
    assert j0 != j1
    assets = spark.createDataFrame(
        [
            ("jpg-0", bytearray(j0), "image/jpeg", w, h, 0),
            ("jpg-1", bytearray(j1), "image/jpeg", w, h, 0),
        ],
        ASSET_SCHEMA,
    )
    feats = {
        r.asset_id: r for r in extract_features(spark, assets, fake_decode=False).collect()
    }
    assert feats["jpg-0"].phash == feats["jpg-1"].phash
    assert feats["jpg-0"].phash64 == feats["jpg-1"].phash64


def test_jpeg_and_png_of_same_image_cluster_by_phash64(spark):
    """Cross-FORMAT perceptual clustering: the lossy JPEG and the lossless
    PNG of the same pixels have different exact content hashes but land
    within a small phash64 Hamming distance, so image_near_dup_pairs
    clusters them — the real-world near-dup shape (same photo, different
    encoder) that neither raw-byte nor decoded-byte hashing can catch."""
    from log_parser_cli_spark.extras.jpeg import encode_jpeg
    from log_parser_cli_spark.extras.multimodal import ASSET_SCHEMA, image_near_dup_pairs
    from log_parser_cli_spark.extras.png import encode_png

    w, h = 32, 32
    grad = _gradient_pixels(w, h)
    other = bytes((255 - grad[i]) if ((i // w) + i) % 2 else grad[i] for i in range(len(grad)))
    assets = spark.createDataFrame(
        [
            ("png", bytearray(encode_png(w, h, 1, grad)), "image/png", w, h, 0),
            ("jpeg", bytearray(encode_jpeg(w, h, 1, grad, quality=90)), "image/jpeg", w, h, 0),
            ("other", bytearray(encode_png(w, h, 1, other)), "image/png", w, h, 0),
        ],
        ASSET_SCHEMA,
    )
    feats = extract_features(spark, assets, fake_decode=False)
    by_id = {r.asset_id: r for r in feats.collect()}
    assert by_id["png"].phash != by_id["jpeg"].phash  # lossy: exact differs
    pairs = {
        (r.asset_a, r.asset_b)
        for r in image_near_dup_pairs(feats, max_hamming=6).collect()
    }
    assert ("jpeg", "png") in pairs
    assert not any("other" in p for p in pairs)


def test_audio_phash64_is_gain_invariant(spark):
    """The audio perceptual hash (envelope shape, mean-relative bits) is
    identical under uniform gain scaling and container re-wraps — both of
    which move the exact content hash — while a different waveform lands
    far away."""
    import math
    import struct

    from log_parser_cli_spark.extras.multimodal import ASSET_SCHEMA
    from log_parser_cli_spark.extras.wav import encode_wav

    n = 2048
    # amplitude-modulated tone: a distinctive envelope
    base = [int(12000 * math.sin(i / 9.0) * (0.2 + 0.8 * abs(math.sin(i / 300.0))))
            for i in range(n)]
    quieter = [int(v * 0.5) for v in base]
    other = [int(12000 * math.sin(i / 9.0) * (1.0 - 0.9 * abs(math.sin(i / 300.0))))
             for i in range(n)]
    wrap = b"LIST" + struct.pack("<I", 4) + b"INFO"
    assets = spark.createDataFrame(
        [
            ("a", bytearray(encode_wav(1, 8000, base)), "audio/wav", 0, 0, 256),
            ("a-wrap", bytearray(encode_wav(1, 8000, base, extra_chunks=wrap)), "audio/wav", 0, 0, 256),
            ("a-quiet", bytearray(encode_wav(1, 8000, quieter)), "audio/wav", 0, 0, 256),
            ("b", bytearray(encode_wav(1, 8000, other)), "audio/wav", 0, 0, 256),
        ],
        ASSET_SCHEMA,
    )
    by_id = {r.asset_id: r for r in extract_features(spark, assets, fake_decode=False).collect()}

    def hamming(x, y):
        return bin((by_id[x].phash64 ^ by_id[y].phash64) & ((1 << 64) - 1)).count("1")

    assert by_id["a"].phash64 == by_id["a-wrap"].phash64  # re-wrap: identical
    assert by_id["a"].phash != by_id["a-quiet"].phash  # gain moves every byte...
    assert hamming("a", "a-quiet") <= 4  # ...but barely moves the envelope
    assert hamming("a", "b") > 16  # inverted envelope is far


def test_image_near_dup_pairs_exclude_audio(spark):
    """Review fix: audio phash64 (envelope hash) lives in an unrelated space
    from the image average-hash — mixed asset tables must not produce
    cross-modality or audio-audio 'image' pairs."""
    import math

    from log_parser_cli_spark.extras.jpeg import encode_jpeg
    from log_parser_cli_spark.extras.multimodal import ASSET_SCHEMA, image_near_dup_pairs
    from log_parser_cli_spark.extras.png import encode_png
    from log_parser_cli_spark.extras.wav import encode_wav

    w, h = 32, 32
    grad = _gradient_pixels(w, h)
    tone = [int(9000 * math.sin(i / 7.0)) for i in range(1024)]
    assets = spark.createDataFrame(
        [
            ("img-png", bytearray(encode_png(w, h, 1, grad)), "image/png", w, h, 0),
            ("img-jpg", bytearray(encode_jpeg(w, h, 1, grad, quality=90)), "image/jpeg", w, h, 0),
            ("wav-1", bytearray(encode_wav(1, 8000, tone)), "audio/wav", 0, 0, 128),
            ("wav-2", bytearray(encode_wav(1, 8000, [int(v * 0.8) for v in tone])), "audio/wav", 0, 0, 128),
        ],
        ASSET_SCHEMA,
    )
    feats = extract_features(spark, assets, fake_decode=False)
    # the two gain-scaled WAVs are phash64-identical — without the mime
    # filter they would band as an 'image' pair
    by_id = {r.asset_id: r.phash64 for r in feats.collect()}
    assert by_id["wav-1"] == by_id["wav-2"]
    pairs = {(r.asset_a, r.asset_b) for r in image_near_dup_pairs(feats, max_hamming=6).collect()}
    assert pairs == {("img-jpg", "img-png")} or pairs == {("img-png", "img-jpg")}
    # projected input that dropped the modality column must raise, not
    # silently band audio hashes into the image space (ADVICE r5)
    import pytest

    with pytest.raises(ValueError, match="mime"):
        image_near_dup_pairs(feats.select("asset_id", "phash64"))


def test_avi_mjpeg_container_roundtrip_and_rejections():
    """The stdlib AVI container round-trips MJPEG frames, skips unknown RIFF
    chunks, and rejects non-MJPEG streams / non-JPEG frame chunks."""
    import struct

    from log_parser_cli_spark.extras.avi import decode_avi_mjpeg, encode_avi_mjpeg
    from log_parser_cli_spark.extras.jpeg import encode_jpeg

    w, h = 16, 12
    frames = [
        encode_jpeg(w, h, 1, bytes(((x * 7 + y * 3 + k * 20) & 0xFF)
                                   for y in range(h) for x in range(w)), quality=92)
        for k in range(5)
    ]
    avi = encode_avi_mjpeg(w, h, frames, fps=4)
    dw, dh, usec, got = decode_avi_mjpeg(avi)
    assert (dw, dh, usec) == (w, h, 250000)
    assert got == frames
    # unknown chunk injected before movi is skipped per RIFF spec
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    body = avi[8:]
    remux = b"RIFF" + struct.pack("<I", len(body) + len(junk)) + body[:4] + junk + body[4:]
    assert decode_avi_mjpeg(remux)[3] == frames
    with pytest.raises(ValueError, match="signature"):
        decode_avi_mjpeg(b"\x00" * 32)
    bad = bytearray(avi)
    i = bad.find(b"MJPG")  # strh handler fourcc
    bad[i : i + 4] = b"H264"
    with pytest.raises(ValueError, match="MJPEG only"):
        decode_avi_mjpeg(bytes(bad))


def test_real_video_decode_and_frame_extraction(spark):
    """Video branch de-stubbed for MJPEG AVI: a re-mux of the same frames
    collapses to one content phash with the first frame's perceptual hash,
    and extract_frames decodes exactly the planned frame grid."""
    import struct

    from log_parser_cli_spark.extras.avi import encode_avi_mjpeg
    from log_parser_cli_spark.extras.jpeg import decode_jpeg, encode_jpeg
    from log_parser_cli_spark.extras.multimodal import (
        ASSET_SCHEMA,
        average_hash,
        extract_frames,
    )

    w, h = 24, 16
    frames = [
        encode_jpeg(w, h, 1, bytes(((3 * x + 5 * y + 25 * k) & 0xFF)
                                   for y in range(h) for x in range(w)), quality=92)
        for k in range(4)
    ]
    avi = encode_avi_mjpeg(w, h, frames, fps=2)  # 2s of video
    junk = b"JUNK" + struct.pack("<I", 4) + b"meta"
    body = avi[8:]
    remux = b"RIFF" + struct.pack("<I", len(body) + len(junk)) + body[:4] + junk + body[4:]
    assets = spark.createDataFrame(
        [
            ("vid-0", bytearray(avi), "video/avi", w, h, 2000),
            ("vid-1", bytearray(remux), "video/avi", w, h, 2000),
        ],
        ASSET_SCHEMA,
    )
    feats = {r.asset_id: r for r in extract_features(spark, assets, fake_decode=False).collect()}
    assert feats["vid-0"].phash == feats["vid-1"].phash  # re-mux: same content
    fw, fh, fc, px0 = decode_jpeg(frames[0])
    assert feats["vid-0"].phash64 == average_hash(fw, fh, fc, px0)  # first frame

    got = sorted(
        (r.frame_ts_ms, r.frame_idx)
        for r in extract_frames(spark, assets.filter(F.col("asset_id") == "vid-0"), every_ms=500).collect()
    )
    # 4 frames at 2 fps = 2000ms; grid 0/500/1000/1500 → frames 0,1,2,3
    assert got == [(0, 0), (500, 1), (1000, 2), (1500, 3)]


def test_avi_dropped_frames_and_truncation():
    """Second review pass: zero-size 00dc chunks (dropped frames) are
    spec-valid and skipped; a payload shorter than its declared RIFF size
    raises ValueError (not struct.error); zero frame duration is rejected."""
    import struct

    from log_parser_cli_spark.extras.avi import decode_avi_mjpeg, encode_avi_mjpeg
    from log_parser_cli_spark.extras.jpeg import encode_jpeg

    w, h = 8, 8
    f0 = encode_jpeg(w, h, 1, bytes(range(64)))
    avi = encode_avi_mjpeg(w, h, [f0], fps=5)
    # splice a zero-size dropped-frame chunk in front of the real frame
    movi_at = avi.find(b"movi")
    dropped = b"00dc" + struct.pack("<I", 0)
    patched = bytearray(avi[: movi_at + 4] + dropped + avi[movi_at + 4 :])
    # fix the two enclosing size fields (RIFF and the movi LIST)
    struct.pack_into("<I", patched, 4, struct.unpack("<I", avi[4:8])[0] + len(dropped))
    list_size_at = movi_at - 4
    struct.pack_into(
        "<I", patched, list_size_at,
        struct.unpack("<I", avi[list_size_at : list_size_at + 4])[0] + len(dropped),
    )
    assert decode_avi_mjpeg(bytes(patched))[3] == [f0]  # dropped chunk skipped
    with pytest.raises(ValueError, match="truncated AVI"):
        decode_avi_mjpeg(avi[:-10])
    zero_usec = bytearray(avi)
    avih_at = zero_usec.find(b"avih") + 8
    struct.pack_into("<I", zero_usec, avih_at, 0)  # dwMicroSecPerFrame = 0
    with pytest.raises(ValueError, match="zero frame duration"):
        decode_avi_mjpeg(bytes(zero_usec))
