"""Structured Streaming front-end for the parse pipeline.

The reference is a batch CLI that micro-batches a file in 50k-line chunks with
evolving state (SURVEY.md §2.9). Its *scoring* semantics — match a stream of
sequences against a frozen template library — map directly onto Structured
Streaming:

- ``stream_replay``: readStream over a token-table directory → per-micro-batch
  parse + enrich against the frozen mapping → append to the routed sink via
  ``foreachBatch`` (the batch pipeline's route stage, unchanged). The
  checkpointLocation gives exactly-once per-batch resume — the streaming twin
  of the batch manifest.
- ``windowed_event_counts``: event-time windowed aggregation with a watermark
  (late-data tolerant counts per sink), the streaming analog of the per-sink
  aggregates. The reference has no watermark/event-time semantics (T5) — this
  is the Spark-native extension point.

Tested with ``trigger(availableNow=True)`` so pytest runs bounded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_parser_cli_spark.operators.parse import parse_stage
from log_parser_cli_spark.plans.pipeline import enrich_stage, load_dims, route_stage


def stream_replay(
    spark: SparkSession,
    fixture_dir: str,
    out_dir: str,
    mapping_df: DataFrame,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Stream the sequences table through parse→enrich→route (frozen mapping).

    Returns the started StreamingQuery; callers awaitTermination() it.
    """
    vocab_rows, source_heads, sources_df = load_dims(spark, fixture_dir)
    seq_schema = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet")).schema
    # file-stream source wants a directory: stream the fixture dir, filtered
    # to the sequences file(s)
    stream = (
        spark.readStream.schema(seq_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "sequences*.parquet")
        .parquet(fixture_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = parse_stage(spark, batch_df, vocab_rows, source_heads)
        enriched = enrich_stage(parsed, mapping_df, sources_df)
        # foreachBatch is at-least-once on micro-batch retry; writing each
        # batch to its own batch_id-keyed subdirectory with overwrite makes
        # the sink idempotent (a retried batch replaces its own output instead
        # of duplicating rows). Readers of <out>/routed discover batch_id as
        # an extra partition column.
        (
            enriched.select(
                "doc_id", "tokens", "n_tok", "source", "sink", "template_id",
                "template_star", "variables", "n_vars",
            )
            .write.mode("overwrite")
            .partitionBy("sink", "template_id")
            .parquet(os.path.join(out_dir, "routed", f"batch_id={batch_id}"))
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_with_discovery(
    spark: SparkSession,
    fixture_dir: str,
    stream_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Streaming twin of the reference's EVOLVING state (T2): each micro-batch
    extends the template library with its novel signatures before routing.

    The library lives as a parquet dir under ``out_dir`` and is
    read-modify-written per batch (foreachBatch runs serially on the driver).
    Extension is IDEMPOTENT — re-extending with already-known signatures is a
    no-op — so an at-least-once batch retry converges to the same library,
    and the routed sink stays exactly-once via batch_id-keyed overwrite.
    Batch 1 bootstraps via full discovery; later batches only append
    (pipeline.ts pre-match-then-discover, sqlite-template-manager.ts:79-85).
    """
    from log_parser_cli_spark.plans.pipeline import discover_templates, extend_mapping

    vocab_rows, source_heads, sources_df = load_dims(spark, fixture_dir)
    seq_schema = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet")).schema
    mapping_path = os.path.join(out_dir, "mapping")

    stream = (
        spark.readStream.schema(seq_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = parse_stage(spark, batch_df, vocab_rows, source_heads)
        if os.path.exists(os.path.join(mapping_path, "_SUCCESS")):
            frozen = spark.read.parquet(mapping_path)
            mapping = extend_mapping(spark, frozen, parsed)
        else:
            mapping = discover_templates(spark, parsed)
        rows = mapping.collect()  # library is tiny; pin before overwriting its source
        mapping = spark.createDataFrame(rows, mapping.schema)
        mapping.write.mode("overwrite").parquet(mapping_path)
        enriched = enrich_stage(parsed, mapping, sources_df)
        (
            enriched.select(
                "doc_id", "tokens", "n_tok", "source", "sink", "template_id",
                "template_star", "variables", "n_vars",
            )
            .write.mode("overwrite")
            .partitionBy("sink", "template_id")
            .parquet(os.path.join(out_dir, "routed", f"batch_id={batch_id}"))
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed counts with late-data watermark (streaming or batch
    DataFrame — same expression works for both)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
