"""Round-6 optimization harness: per-query isolated timing + plan capture.

NOT the driver bench (bench.py is frozen). This file exists so optimization
evidence (guide §1: measure first, noop-sink isolation, labeled jobs) can be
collected per query without touching the frozen methodology:

- same session shape as bench.py's headline level (local[CPUS/2],
  shuffle_partitions=64, tmpfs scratch),
- each query timed with the SAME ``.collect()`` the driver bench uses, plus a
  noop-sink run that isolates computation from result pickling,
- ``--explain`` writes ``plans/r06/<query>_<tag>.txt`` with
  ``explain("formatted")`` output for the judge's plan-claim checks.

Usage:
  python bench_extra.py [--explain TAG] [--runs N] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "match_regex_counts", "eval_metrics", "dedup_minhash_docs", "ann_topk",
    "doc_quality", "head_derive", "eval_from_reports", "embedding_dedup", "ann_ivf",
    "ann_ivf_join", "dedup_simhash_wide", "dedup_simhash_capped", "compression_gain",
]


def new_spark(cores: int | None = None):
    from log_parser_cli_spark.session import get_spark

    os.makedirs("/dev/shm/lpcs_bench", exist_ok=True)
    return get_spark(
        app_name="lpcs-bench-extra",
        cores=cores or min(max(CPUS // 2, 2), 16),
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/lpcs_bench",
            "spark.sql.files.maxPartitionBytes": "1m",
        },
    )


def main() -> int:
    args = sys.argv[1:]
    explain_tag = None
    runs = 1
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--explain":
            explain_tag = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = BENCH_QUERIES

    from log_parser_cli_spark import entry_impl as EI

    spark = new_spark()
    sc = spark.sparkContext
    out: dict[str, dict] = {}
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        fn = EI.QUERIES[name]
        rec: dict = {}
        if explain_tag:
            df = fn(spark, SF_DIR)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{explain_tag}.txt"), "w") as f:
                f.write(txt)
        # noop-sink isolation (computation only, no driver pickling)
        walls = []
        for _ in range(runs):
            sc.setJobDescription(f"{name}: noop")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        rec["noop"] = walls
        # the driver bench's exact methodology (.collect())
        walls = []
        for _ in range(runs):
            sc.setJobDescription(f"{name}: collect")
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            walls.append(round(time.time() - t0, 2))
        rec["collect"] = walls
        sc.setJobDescription(None)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
