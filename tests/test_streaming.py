"""Structured Streaming replay: streamed routed output == batch routed output."""

import os

import pyspark.sql.functions as F

from log_parser_cli_spark.plans.pipeline import run_pipeline
from log_parser_cli_spark.streaming.stream import stream_replay, windowed_event_counts


def test_stream_replay_matches_batch(spark, fixture_dir, pipeline_out, tmp_path):
    mapping = spark.read.parquet(os.path.join(pipeline_out, "template_mapping"))
    out = str(tmp_path / "stream_out")
    q = stream_replay(spark, fixture_dir, out, mapping, available_now=True)
    q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out, "routed"))
    batch = spark.read.parquet(os.path.join(pipeline_out, "routed"))
    assert streamed.count() == batch.count()
    s_counts = {
        (r.source, r.template_id): r.n
        for r in streamed.groupBy("source", "template_id").agg(F.count("*").alias("n")).collect()
    }
    b_counts = {
        (r.source, r.template_id): r.n
        for r in batch.groupBy("source", "template_id").agg(F.count("*").alias("n")).collect()
    }
    assert s_counts == b_counts

    # restart with availableNow on the same checkpoint: no new data → no dupes
    q2 = stream_replay(spark, fixture_dir, out, mapping, available_now=True)
    q2.awaitTermination(60)
    assert spark.read.parquet(os.path.join(out, "routed")).count() == batch.count()


def test_windowed_event_counts_batch_semantics(spark):
    rows = [
        ("2024-01-01 00:10:00", "click"),
        ("2024-01-01 00:20:00", "click"),
        ("2024-01-01 01:05:00", "click"),
        ("2024-01-01 01:30:00", "view"),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string")
    got = {
        (str(r.window_start), r.event_type): r.n_events
        for r in windowed_event_counts(df, "1 hour", "30 minutes").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == 2
    assert got[("2024-01-01 01:00:00", "click")] == 1
    assert got[("2024-01-01 01:00:00", "view")] == 1
