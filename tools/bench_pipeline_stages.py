"""Stage-level timing of the replay / discovery pipeline at bench scale.

Guide §1: isolate each expensive piece with the noop sink so we time the
computation, not the sink. Prints one JSON line with per-stage walls.

Usage: python tools/bench_pipeline_stages.py [--rows N] [--cores N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> int:
    rows = 19_200_000
    cores = min(max(CPUS // 2, 2), 16)
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--rows":
            rows = int(args[i + 1]); i += 2
        elif args[i] == "--cores":
            cores = int(args[i + 1]); i += 2
        else:
            i += 1

    from log_parser_cli_spark.datagen import ensure_fixtures
    from log_parser_cli_spark.session import get_spark
    from log_parser_cli_spark.plans.pipeline import (
        discover_templates, enrich_stage, load_dims, route_stage, read_routed,
        aggregate_stage,
    )
    from log_parser_cli_spark.operators.parse import parse_stage
    from log_parser_cli_spark.entry_impl import ENGINE_VERSION

    fixture_dir = ensure_fixtures(f"bench{rows // 1000}k", n_rows=rows)
    mapping_dir = os.path.join(fixture_dir, f"_mapping-v{ENGINE_VERSION}")
    os.makedirs("/dev/shm/lpcs_bench", exist_ok=True)
    spark = get_spark(
        app_name="lpcs-stage-bench",
        cores=cores,
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/lpcs_bench",
            "spark.sql.files.maxPartitionBytes": "1m",
        },
    )
    sc = spark.sparkContext
    vocab_rows, source_heads, sources_df = load_dims(spark, fixture_dir)
    seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
    timings: dict[str, float] = {}

    def t(label: str, fn):
        sc.setJobDescription(label)
        t0 = time.time()
        out = fn()
        timings[label] = round(time.time() - t0, 2)
        sc.setJobDescription(None)
        print(json.dumps({label: timings[label]}), flush=True)
        return out

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: one scan
    seq.count()

    # 1. scan only
    t("scan_noop", lambda: noop(seq))
    # 2. parse only
    t("parse_noop", lambda: noop(parse_stage(spark, seq, vocab_rows, source_heads)))
    # 3. parse + enrich (frozen mapping)
    mapping = spark.read.parquet(mapping_dir)
    t("parse_enrich_noop", lambda: noop(
        enrich_stage(parse_stage(spark, seq, vocab_rows, source_heads), mapping, sources_df)
    ))
    # 4. full replay route write (snapshot commit)
    import shutil, tempfile
    out_dir = tempfile.mkdtemp(prefix="lpcs_stage_", dir="/dev/shm/lpcs_bench")
    enriched = enrich_stage(parse_stage(spark, seq, vocab_rows, source_heads), mapping, sources_df)
    t("route_write", lambda: route_stage(enriched, out_dir, salt_buckets=4))
    # 5. aggregate from routed re-read
    t("aggregate", lambda: aggregate_stage(spark, read_routed(spark, out_dir), out_dir))
    shutil.rmtree(out_dir, ignore_errors=True)

    # ---- discovery-path pieces -------------------------------------------
    parsed = parse_stage(spark, seq, vocab_rows, source_heads)
    # discovery aggregation alone (no persist: recompute parse)
    t("discover_from_scratch", lambda: discover_templates(spark, parsed))

    # persist-based (what run_pipeline(checkpoint_parse=False) does)
    p2 = parse_stage(spark, seq, vocab_rows, source_heads).persist()
    t("persist_count", lambda: p2.count())
    t("discover_from_cache", lambda: discover_templates(spark, p2))
    out_dir2 = tempfile.mkdtemp(prefix="lpcs_stage2_", dir="/dev/shm/lpcs_bench")
    enriched2 = enrich_stage(p2, mapping, sources_df)
    t("route_write_from_cache", lambda: route_stage(enriched2, out_dir2, salt_buckets=4))
    t("aggregate2", lambda: aggregate_stage(spark, read_routed(spark, out_dir2), out_dir2))
    p2.unpersist()
    shutil.rmtree(out_dir2, ignore_errors=True)

    print(json.dumps(timings))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
