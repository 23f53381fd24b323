"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; heavy decode/feature steps are Arrow-batched ``mapInPandas``
stages. The decode kernels themselves are STUBBED (no image/audio libraries in
this container — they raise ``NotImplementedError`` unless the deterministic
fake mode is on), but everything Spark-side is real and tested: schema,
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
    T.StructField("decoded", T.BooleanType()),
]


def make_fake_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (binary payloads derived from md5)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"{seed}-{i}".encode()).digest() * (4 + i % 7)
        mime = ["image/png", "image/jpeg", "audio/wav", "video/mp4"][i % 4]
        rows.append((f"asset-{i:06d}", bytearray(payload), mime, 64 + i, 48 + i, 1000 * (i + 1)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _decode_payload(payload: bytes) -> bytes:
    """Decode a payload to its raw decoded content bytes.

    PNG (``extras/png.py``: zlib inflate + scanline unfilter) and PCM WAV
    (``extras/wav.py``: RIFF parse) decode for real with stdlib only;
    JPEG/compressed-audio/video kernels genuinely need external codec
    libraries not present in this container and stay stubbed. The returned
    bytes are prefixed with the decoded geometry (dims / channel+rate+bits):
    two payloads whose raw streams coincide under different shapes must not
    collide when the decoded content is hashed.
    """
    import struct

    from log_parser_cli_spark.extras.png import PNG_SIGNATURE, decode_png
    from log_parser_cli_spark.extras.wav import RIFF_MAGIC, WAVE_MAGIC, decode_wav

    data = bytes(payload)
    if data[:8] == PNG_SIGNATURE:
        w, h, c, pixels = decode_png(data)
        return struct.pack(">IIB", w, h, c) + pixels
    if data[:4] == RIFF_MAGIC and data[8:12] == WAVE_MAGIC:
        n_ch, rate, bits, frames = decode_wav(data)
        return struct.pack(">HIH", n_ch, rate, bits) + frames
    raise NotImplementedError(
        "only PNG and PCM WAV decode in-container (stdlib); "
        "JPEG/compressed-audio/video need codec libraries"
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
    Other payloads still raise ``NotImplementedError`` (JPEG/compressed-
    audio/video codecs are not in this container).
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
            else:
                out["phash"] = payloads.map(
                    lambda b: hashlib.md5(_decode_payload(b)).hexdigest()[:16]
                    if b is not None
                    else None
                )
            out["decoded"] = payloads.notna()
            yield out

    return assets.mapInPandas(run, schema=out_schema)


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


def frame_sample_plan(assets: DataFrame, every_ms: int = 500) -> DataFrame:
    """Plan frame-sampling work without decoding: one row per (asset, ts_ms).

    Pure Catalyst (sequence + explode) — the decode of each planned frame is
    the stubbed mapInPandas stage above. Demonstrates how a 100 TB video
    corpus fans out to frame tasks without touching payload bytes.
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
