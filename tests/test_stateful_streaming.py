"""applyInPandasWithState: running template counters across micro-batches."""

import os

import pyspark.sql.functions as F

from log_parser_cli_spark.plans.pipeline import read_routed
from log_parser_cli_spark.streaming.stateful import running_template_counts


def test_running_counts_accumulate_across_microbatches(spark, fixture_dir, pipeline_out, tmp_path):
    # split the routed output into several files → several micro-batches
    routed = read_routed(spark, pipeline_out).select(
        "doc_id", "source", "template_id"
    )
    stream_src = str(tmp_path / "stream_src")
    routed.repartition(4).write.parquet(stream_src)

    stream = (
        spark.readStream.schema(routed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src)
    )
    counters = running_template_counts(stream)
    q = (
        counters.writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # the LAST update per (source, template_id) must equal the batch totals
    mem = spark.sql("SELECT * FROM running_counts")
    latest = (
        mem.groupBy("source", "template_id")
        .agg(F.max("running_count").alias("running_count"))
        .collect()
    )
    got = {(r.source, r.template_id): r.running_count for r in latest}
    expected = {
        (r.source, r.template_id): r.n
        for r in routed.groupBy("source", "template_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == expected

    # multiple micro-batches actually happened (counts grew incrementally)
    n_updates = mem.count()
    assert n_updates > len(expected)
