"""Routing stage: unknown-source rows classified by head-pattern vote."""

import os

import pyspark.sql.functions as F

from log_parser_cli_spark.operators.parse import infer_sources
from log_parser_cli_spark.plans.pipeline import load_dims


def test_infer_sources_recovers_ground_truth(spark, fixture_dir):
    vocab_rows, source_heads, _ = load_dims(spark, fixture_dir)
    seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
    anon = seq.withColumn("source", F.lit(None).cast("string"))
    inferred = infer_sources(spark, anon, vocab_rows, source_heads)
    gt = spark.read.parquet(os.path.join(fixture_dir, "ground_truth.parquet")).select(
        "doc_id", F.col("source").alias("gt_source"), "head_matched"
    )
    j = inferred.select("doc_id", "source").join(gt, "doc_id")
    # head-matched rows route to their true source (fixture heads are
    # mutually exclusive); noise rows land in __UNKNOWN__
    bad = j.filter(
        (F.col("head_matched") & (F.col("source") != F.col("gt_source")))
        | (~F.col("head_matched") & (F.col("source") != "__UNKNOWN__"))
    )
    assert bad.count() == 0, bad.take(5)


def test_infer_sources_passthrough_when_known(spark, fixture_dir):
    vocab_rows, source_heads, _ = load_dims(spark, fixture_dir)
    seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
    same = infer_sources(spark, seq, vocab_rows, source_heads)
    diff = (
        same.select("doc_id", F.col("source").alias("s2"))
        .join(seq.select("doc_id", "source"), "doc_id")
        .filter(F.col("s2") != F.col("source"))
    )
    assert diff.count() == 0
