"""spark-submit entrypoint: the full parse → enrich → route → aggregate job.

Ship the package and run:

    python -m zipfile -c /tmp/lpcs.zip log_parser_cli_spark
    spark-submit --py-files /tmp/lpcs.zip log_parser_cli_spark/jobs.py \
        --fixtures data/fixtures/sf0.01 --out /tmp/run1 [--resume] \
        [--cores 32] [--run-id run-1]

On a cluster, drop --cores and let the deploy mode size executors; the job
code is identical (the session factory only pins local[N] when asked).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="log_parser_cli_spark pipeline job")
    ap.add_argument("--fixtures", required=True, help="fixture dir (sequences/vocab/sources parquet)")
    ap.add_argument("--out", required=True, help="output dir for routed tables + aggregates")
    ap.add_argument("--run-id", default="run-1")
    ap.add_argument("--resume", action="store_true", help="skip stages committed in the manifest")
    ap.add_argument("--lineage", action="store_true", help="write per-partition lineage metrics")
    ap.add_argument("--cores", type=int, default=None, help="local[N] override (omit on a cluster)")
    ap.add_argument("--salt-buckets", type=int, default=16)
    args = ap.parse_args(argv)

    from log_parser_cli_spark.plans.pipeline import run_pipeline
    from log_parser_cli_spark.session import get_spark

    spark = get_spark(app_name=f"lpcs-{args.run_id}", cores=args.cores)
    t0 = time.time()
    result = run_pipeline(
        spark,
        args.fixtures,
        args.out,
        run_id=args.run_id,
        resume=args.resume,
        lineage=args.lineage,
        salt_buckets=args.salt_buckets,
    )
    wall = time.time() - t0

    import pyspark.sql.functions as F

    counts = spark.read.parquet(f"{args.out}/sink_counts")
    n_rows = counts.agg(F.sum("n_sequences")).first()[0]
    n_templates = counts.filter(~F.col("template_id").startswith("__")).count()
    print(f"stages_run={result.stages_run} stages_skipped={result.stages_skipped}")
    print(f"rows={n_rows} templates={n_templates} wall_sec={wall:.2f} seq_per_sec={n_rows / wall:.0f}")
    counts.orderBy(F.desc("n_sequences")).show(12, truncate=60)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
