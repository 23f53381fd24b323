"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; heavy decode/feature steps are Arrow-batched ``mapInPandas``
stages. PNG, baseline JPEG, and PCM WAV decode for REAL with stdlib-only
codecs (``extras/png.py`` / ``extras/jpeg.py`` / ``extras/wav.py``);
compressed audio and video genuinely need codec libraries absent from this
container and raise ``NotImplementedError`` unless the deterministic fake
mode is on. Everything Spark-side is real and tested either way: schema,
partition-preserving batch iteration, UDF signatures, batch shapes.

At 100 TB the shape matters: payloads stay in executor memory one Arrow batch
at a time (bounded by arrow.maxRecordsPerBatch), metadata-only stages prune
the binary column entirely (column pruning keeps the scan light), and
feature rows are a tiny fraction of payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_FIELDS = [
    T.StructField("n_bytes", T.LongType()),
    T.StructField("phash", T.StringType()),
    T.StructField("phash64", T.LongType()),
    T.StructField("decoded", T.BooleanType()),
]


def average_hash(width: int, height: int, channels: int, pixels: bytes, grid: int = 8) -> int:
    """True 64-bit PERCEPTUAL hash of decoded 8-bit pixels (average-hash):
    integer-luma grayscale → ``grid``×``grid`` block means → bit set where a
    block is ≥ the mean of block means. Pure stdlib, deterministic. Unlike
    the exact content hash, a one-pixel edit or a small brightness ripple
    moves only the few blocks it touches — near-identical images land within
    a small Hamming distance, so the hash feeds pigeonhole banding
    (``image_near_dup_pairs``) exactly like a text SimHash. Returned as a
    signed 64-bit value (two's-complement wrap) so it stores in a LongType
    column."""
    stride = width * channels
    means = []
    for gy in range(grid):
        y0 = gy * height // grid
        y1 = max(y0 + 1, (gy + 1) * height // grid)
        for gx in range(grid):
            x0 = gx * width // grid
            x1 = max(x0 + 1, (gx + 1) * width // grid)
            total = 0
            count = 0
            for y in range(min(y0, height - 1), min(y1, height)):
                row = y * stride
                for x in range(min(x0, width - 1), min(x1, width)):
                    p = row + x * channels
                    if channels >= 3:
                        lum = (299 * pixels[p] + 587 * pixels[p + 1] + 114 * pixels[p + 2]) // 1000
                    else:
                        lum = pixels[p]  # gray / gray+alpha: first byte is luma
                    total += lum
                    count += 1
            means.append(total / count)
    overall = sum(means) / len(means)
    h = 0
    for i, m in enumerate(means):
        if m >= overall:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def make_fake_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (binary payloads derived from md5)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"{seed}-{i}".encode()).digest() * (4 + i % 7)
        mime = ["image/png", "image/jpeg", "audio/wav", "video/mp4"][i % 4]
        rows.append((f"asset-{i:06d}", bytearray(payload), mime, 64 + i, 48 + i, 1000 * (i + 1)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def average_hash_audio(
    n_channels: int, bits: int, frames: bytes, grid: int = 64
) -> int:
    """64-bit perceptual hash of decoded PCM audio: mono-mixed absolute
    amplitude → ``grid`` equal time windows → bit set where a window's mean
    energy is ≥ the mean of window means (the envelope shape). Pure stdlib,
    deterministic. Mean-relative bits make the hash invariant under uniform
    gain scaling and container re-wraps, while a different recording lands
    far away — the audio twin of ``average_hash``. Signed 64-bit wrap for
    LongType storage."""
    import struct

    width = bits // 8
    n = len(frames) // (width * n_channels)
    if n == 0:
        return 0
    if bits == 8:
        vals = [abs(b - 128) for b in frames]  # 8-bit WAV is unsigned
    elif bits == 16:
        vals = [abs(v) for v in struct.unpack(f"<{n * n_channels}h", frames)]
    else:  # 24/32-bit signed little-endian
        vals = [
            abs(
                int.from_bytes(
                    frames[i * width : (i + 1) * width], "little", signed=True
                )
            )
            for i in range(n * n_channels)
        ]
    mono = [
        sum(vals[i * n_channels : (i + 1) * n_channels]) / n_channels for i in range(n)
    ]
    means = []
    for g in range(grid):
        lo = g * n // grid
        hi = max(lo + 1, (g + 1) * n // grid)
        w = mono[min(lo, n - 1) : min(hi, n)]
        means.append(sum(w) / len(w))
    overall = sum(means) / len(means)
    h = 0
    for i, m in enumerate(means):
        if m >= overall:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def _decode_payload(payload: bytes) -> tuple[bytes, int | None]:
    """Decode a payload once → (content bytes for the EXACT hash, perceptual
    ``average_hash`` for images or None).

    PNG (``extras/png.py``: zlib inflate + scanline unfilter), baseline
    JPEG (``extras/jpeg.py``: Huffman + IDCT + chroma upsample, pure
    stdlib), and PCM WAV (``extras/wav.py``: RIFF parse) decode for real
    with stdlib only; compressed-audio/video kernels genuinely need
    external codec libraries not present in this container and stay
    stubbed. The content
    bytes are prefixed with the decoded geometry (dims / channel+rate+bits):
    two payloads whose raw streams coincide under different shapes must not
    collide when the decoded content is hashed.
    """
    import struct

    from log_parser_cli_spark.extras.avi import AVI_MAGIC, decode_avi_mjpeg
    from log_parser_cli_spark.extras.jpeg import SOI, decode_jpeg
    from log_parser_cli_spark.extras.png import PNG_SIGNATURE, decode_png
    from log_parser_cli_spark.extras.wav import RIFF_MAGIC, WAVE_MAGIC, decode_wav

    data = bytes(payload)
    if data[:8] == PNG_SIGNATURE:
        w, h, c, pixels = decode_png(data)
        return struct.pack(">IIB", w, h, c) + pixels, average_hash(w, h, c, pixels)
    if data[:2] == SOI and data[2:3] == b"\xff":
        w, h, c, pixels = decode_jpeg(data)
        return struct.pack(">IIB", w, h, c) + pixels, average_hash(w, h, c, pixels)
    if data[:4] == RIFF_MAGIC and data[8:12] == WAVE_MAGIC:
        n_ch, rate, bits, frames = decode_wav(data)
        return (
            struct.pack(">HIH", n_ch, rate, bits) + frames,
            average_hash_audio(n_ch, bits, frames),
        )
    if data[:4] == RIFF_MAGIC and data[8:12] == AVI_MAGIC:
        # MJPEG AVI: content = geometry + every decoded frame's pixels (a
        # re-mux of the same frames collapses to one hash); perceptual =
        # the FIRST frame's average-hash (thumbnail semantics)
        w, h, usec, frames = decode_avi_mjpeg(data)
        decoded = [decode_jpeg(f) for f in frames]
        content = struct.pack(">IIII", w, h, usec, len(frames)) + b"".join(
            d[3] for d in decoded
        )
        fw, fh, fc, px0 = decoded[0]
        return content, average_hash(fw, fh, fc, px0)
    raise NotImplementedError(
        "only PNG, baseline JPEG, PCM WAV, and MJPEG AVI decode in-container "
        "(stdlib); inter-frame video and compressed audio need codec libraries"
    )


def extract_features(
    spark: SparkSession, assets: DataFrame, fake_decode: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``fake_decode=True`` computes deterministic features from the raw bytes
    (length + md5 content hash) without decoding. ``fake_decode=False`` runs
    the REAL decode kernels: PNG payloads inflate + unfilter to raw pixels
    (``extras/png.py``) and PCM WAV payloads parse to raw frames
    (``extras/wav.py``), both stdlib-only, and ``phash`` hashes the DECODED
    content — so two encodings of the same image (different filters /
    compression levels) or two WAV containers of the same samples (extra
    RIFF chunks) collapse to one hash, which raw-byte hashing cannot do.
    Images additionally get ``phash64``, a true PERCEPTUAL average-hash over
    the decoded pixels (see ``average_hash``): near-identical images — a
    pixel edit, a mild brightness shift — land within a small Hamming
    distance, feeding ``image_near_dup_pairs`` banding; the exact ``phash``
    stays alongside for byte-level identity. Compressed-audio/video payloads
    still raise ``NotImplementedError`` (those codecs are not in this
    container).
    """
    out_schema = T.StructType(
        [f for f in assets.schema.fields if f.name != "payload"] + FEATURE_FIELDS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            out = pdf.drop(columns=["payload"]).copy()
            out["n_bytes"] = payloads.map(lambda b: len(b) if b is not None else 0).astype("int64")
            if fake_decode:
                out["phash"] = payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()[:16] if b is not None else None
                )
                out["phash64"] = None
            else:
                decoded = payloads.map(
                    lambda b: _decode_payload(b) if b is not None else (None, None)
                )
                out["phash"] = decoded.map(
                    lambda t: hashlib.md5(t[0]).hexdigest()[:16] if t[0] is not None else None
                )
                out["phash64"] = decoded.map(lambda t: t[1])
            out["decoded"] = payloads.notna()
            yield out

    return assets.mapInPandas(run, schema=out_schema)


def image_near_dup_pairs(
    features: DataFrame,
    max_hamming: int = 6,
    chunks: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs (asset a < b, hamming) over ``phash64`` —
    the perceptual twin of ``dedup.simhash_pairs``: the 64-bit hash splits
    into ``chunks`` exact sub-keys (8×8 bits by default) and a pair within
    Hamming ≤ ``max_hamming`` must share ≥1 chunk (pigeonhole, enforced), so
    candidates come from banded equi-joins with the same hot-bucket guard —
    never an all-pairs join over the corpus. ``>>`` is arithmetic on the
    signed hash, but the chunk mask keeps only the shifted byte, so negative
    (bit-63-set) hashes band correctly."""
    if chunks <= max_hamming:
        raise ValueError(
            f"pigeonhole banding needs chunks > max_hamming "
            f"(got chunks={chunks}, max_hamming={max_hamming})"
        )
    if 64 % chunks != 0:
        raise ValueError(f"chunks={chunks} must divide 64 bits")
    from log_parser_cli_spark.extras.dedup import banded_pair_join

    width = 64 // chunks
    mask = (1 << width) - 1
    if "mime" not in features.columns:
        # audio carries a phash64 too (envelope hash) and the two hash
        # spaces are unrelated — banding them together silently produces
        # cross-modality "image" pairs. Refuse projected inputs that
        # dropped the modality column rather than degrade.
        raise ValueError(
            "image_near_dup_pairs needs a 'mime' column to exclude "
            "non-image phash64 rows (audio envelope hashes share the "
            "column but not the hash space); pass the un-projected "
            "features output"
        )
    fp = features.filter(F.col("phash64").isNotNull()).filter(
        F.col("mime").startswith("image/")
    )
    fp = fp.select(F.col("asset_id").alias("doc"), F.col("phash64").alias("ph"))
    banded = fp.select(
        "doc",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.expr(f"(ph >> {c * width}) & {mask}").alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc", "ph", "ck.chunk", "ck.val")
    pairs = banded_pair_join(banded, ["chunk", "val"], max_bucket, payload=("ph",))
    return pairs.select(
        F.col("a").alias("asset_a"),
        F.col("b").alias("asset_b"),
        F.bit_count(F.expr("ph_a ^ ph_b")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def payload_embeddings(
    spark: SparkSession, assets: DataFrame, dim: int = 16, fake_encode: bool = True
) -> DataFrame:
    """Arrow-batched payload → embedding stage: (asset_id, embedding).

    The encoder is the multimodal analog of the decode stub: with
    ``fake_encode`` it derives a deterministic unit vector from the payload
    bytes (md5-expanded, so near-identical payloads get identical vectors);
    a real model slots into the same mapInPandas signature. Output feeds the
    similarity family unchanged — ANN top-k / LSH near-dup over assets is
    ``cosine_topk`` / ``rhp_candidates`` + ``cosine_pairs`` on this frame.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def embed(payload: bytes) -> list[float]:
        if payload is None:
            return [0.0] * dim
        raw = []
        i = 0
        while len(raw) < dim:
            h = hashlib.md5(bytes(payload) + i.to_bytes(2, "big")).digest()
            raw.extend(b / 255.0 - 0.5 for b in h)
            i += 1
        v = raw[:dim]
        norm = sum(x * x for x in v) ** 0.5 or 1.0
        return [float(x / norm) for x in v]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake_encode:
                raise NotImplementedError("real encoders are not bundled in this container")
            out = pd.DataFrame(
                {"asset_id": pdf["asset_id"], "embedding": pdf["payload"].map(embed)}
            )
            yield out

    return assets.select("asset_id", "payload").mapInPandas(run, schema=out_schema)


def extract_frames(
    spark: SparkSession, assets: DataFrame, every_ms: int = 500
) -> DataFrame:
    """REAL frame extraction for MJPEG AVI payloads: one row per sampled
    (asset, ts) with the decoded frame's geometry and perceptual hash.

    The Arrow-batched execution of what ``frame_sample_plan`` plans: per
    video, only the frames on the ``every_ms`` grid are JPEG-decoded (frame
    index = ts / container frame duration), never the whole stream. The
    time grid derives from the CONTAINER's own header (frame count × frame
    duration), not the metadata column. Non-AVI video payloads raise — the
    never-garbage posture; inter-frame codecs need external libraries.
    """
    from log_parser_cli_spark.extras.avi import decode_avi_mjpeg
    from log_parser_cli_spark.extras.jpeg import decode_jpeg

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.StringType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("frame_phash64", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "frame_ts_ms", "frame_idx", "width", "height", "frame_phash64"]
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h, usec, frames = decode_avi_mjpeg(bytes(payload))
                duration_ms = usec * len(frames) // 1000
                decoded: dict[int, tuple[int, int, int]] = {}  # idx → features
                for ts in range(0, max(duration_ms, 1), every_ms):
                    idx = min(ts * 1000 // usec, len(frames) - 1)
                    if idx not in decoded:
                        # a grid finer than the frame rate maps several ts
                        # to one frame — decode (Huffman+IDCT) each ONCE
                        fw, fh, fc, px = decode_jpeg(frames[idx])
                        decoded[idx] = (fw, fh, average_hash(fw, fh, fc, px))
                    fw, fh, ph = decoded[idx]
                    rows.append((aid, ts, idx, fw, fh, ph))
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return (
        assets.filter(F.col("mime").startswith("video/"))
        .select("asset_id", "payload")
        .mapInPandas(run, schema=out_schema)
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 500) -> DataFrame:
    """Plan frame-sampling work without decoding: one row per (asset, ts_ms).

    Pure Catalyst (sequence + explode) — ``extract_frames`` is the decode
    stage this plans for. Demonstrates how a 100 TB video corpus fans out
    to frame tasks without touching payload bytes.
    """
    return (
        assets.filter(F.col("mime").startswith("video/"))
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
