"""Dump formatted physical plans of the engine's key operators to PLANS.md
and assert their shape: broadcast joins where expected, predicate/column
pushdown into parquet scans, no cartesian products, whole-stage codegen spans.

Usage: python tools/explain_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    from log_parser_cli_spark.datagen import ensure_fixtures
    from log_parser_cli_spark.operators.parse import parse_stage
    from log_parser_cli_spark.plans.pipeline import discover_templates, enrich_stage, load_dims
    from log_parser_cli_spark.session import get_spark
    from log_parser_cli_spark.extras.dedup import simhash, simhash_pairs, minhash_dedup
    from log_parser_cli_spark.extras.similarity import cosine_topk

    spark = get_spark(app_name="explain", cores=8, extra_conf={"spark.ui.showConsoleProgress": "false"})
    fx = ensure_fixtures("sf0.01")
    vocab_rows, source_heads, sources_df = load_dims(spark, fx)
    seq = spark.read.parquet(os.path.join(fx, "sequences.parquet"))

    sections: list[tuple[str, str, list[str], list[str]]] = []
    # (title, plan, must_contain, must_not_contain)

    parsed = parse_stage(spark, seq, vocab_rows, source_heads)
    mapping = discover_templates(spark, parsed)
    enriched = enrich_stage(parsed, mapping, sources_df)
    routed_cols = enriched.select(
        "doc_id", "tokens", "n_tok", "source", "sink", "template_id", "template_star",
        "variables", "n_vars",
    ).repartition(F.col("sink"), F.col("template_id"), F.pmod(F.hash("doc_id"), F.lit(4)))
    sections.append(
        (
            "enrich + fan-out repartition (parse → broadcast joins → salted exchange)",
            plan_of(routed_cols),
            ["BroadcastHashJoin", "MapInArrow", "Exchange", "hashpartitioning"],
            ["CartesianProduct", "SortMergeJoin"],
        )
    )

    # column pruning + predicate pushdown on the routed-style scan
    pruned = seq.select("doc_id", "n_tok").filter(F.col("n_tok") > 20)
    sections.append(
        (
            "pruned + filtered scan (Catalyst pushdown into parquet)",
            plan_of(pruned),
            ["PushedFilters: [IsNotNull(n_tok), GreaterThan(n_tok,20)]", "ReadSchema: struct<doc_id:string,n_tok:int>"],
            [],
        )
    )

    # aggregates: map-side partial aggregation (two HashAggregates around the exchange)
    agg = enriched.groupBy("source", "sink", "template_id").agg(F.count("*").alias("n"))
    sections.append(
        (
            "per-sink aggregate (partial → exchange → final)",
            plan_of(agg),
            ["HashAggregate", "Exchange", "hashpartitioning"],
            ["CartesianProduct"],
        )
    )

    # head-derive pool: broadcast step join + map-side hash filter; the only
    # sort (for the window rank) runs on the filtered residue, and the big
    # side never exchanges before the filter
    from pyspark.sql import Window

    gt = spark.read.parquet(os.path.join(fx, "ground_truth.parquet")).select(
        "source", "line_no", "rendered"
    )
    steps = spark.createDataFrame([("apache", 3), ("hdfs", 2)], "_g string, _step long")
    h32 = "CAST(conv(substr(md5(concat('pool|', CAST(line_no AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    pool = (
        gt.join(F.broadcast(steps), F.col("source") == F.col("_g"))
        .filter(F.expr(h32) % F.col("_step") == 0)
        .withColumn("_rn", F.row_number().over(Window.partitionBy("source").orderBy("line_no")))
        .filter(F.col("_rn") <= 2000)
    )
    sections.append(
        (
            "head-derive pool (broadcast steps → map-side hash filter → residue-only rank)",
            plan_of(pool),
            ["BroadcastHashJoin", "md5"],
            ["CartesianProduct", "SortMergeJoin"],
        )
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sh_pairs = simhash_pairs(simhash(docs, "doc_id", "text"))
    sections.append(
        (
            "simhash near-dup candidates (pigeonhole equi-join, no cross join)",
            plan_of(sh_pairs),
            ["HashJoin"],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        )
    )

    from log_parser_cli_spark.extras.dedup import simhash_pairs_wide

    sh_wide = simhash_pairs_wide(simhash(docs, "doc_id", "text"), max_hamming=8, chunks=10)
    sections.append(
        (
            "simhash WIDE radius 8 (C(10,2)=45 combination bands, still equi-joins only)",
            plan_of(sh_wide),
            ["HashJoin"],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        )
    )

    # guarded path: window bucket-count on the SAME keys as the pair join,
    # normal pairs + star pairs unioned — still equi-joins only, no cartesian
    sh_capped = simhash_pairs(simhash(docs, "doc_id", "text"), max_bucket=64)
    sections.append(
        (
            "simhash with hot-bucket guard (window count → normal equi-join ∪ star, cap 64)",
            plan_of(sh_capped),
            ["Window", "HashJoin", "Union"],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        )
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    topk = cosine_topk(emb, [0, 1, 2], k=5)
    sections.append(
        (
            "cosine top-k (broadcast query side + per-query window)",
            plan_of(topk),
            ["BroadcastNestedLoopJoin", "WindowExec|Window"],
            [],
        )
    )

    # embedding near-dup: LSH band candidates feed the exact verify — the
    # corpus is NEVER self-joined unkeyed (no cartesian / nested-loop join)
    from log_parser_cli_spark.extras.similarity import cosine_pairs, rhp_candidates

    cands = rhp_candidates(emb, dim=64, n_planes=60, rows_per_band=3)
    emb_dedup = cosine_pairs(emb, threshold=0.4, candidates=cands)
    sections.append(
        (
            "embedding near-dup (hyperplane-LSH candidates → cosine verify, keyed joins only)",
            plan_of(emb_dedup),
            ["HashJoin"],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        )
    )

    # cross-family jaccard: simhash chunk candidates → shingle-join verify
    from log_parser_cli_spark.extras.dedup import jaccard_pairs, simhash_candidates

    jac = jaccard_pairs(
        docs, "doc_id", "text", k=2, threshold=0.3,
        candidates=simhash_candidates(simhash(docs, "doc_id", "text")),
    )
    sections.append(
        (
            "candidate-fed jaccard (simhash bands → shingle equi-join → verify)",
            plan_of(jac),
            ["HashJoin"],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        )
    )

    # IVF: centroid literals → whole-stage-codegen assignment, probe join
    from log_parser_cli_spark.extras.similarity import centroids_from_parquet, ivf_topk

    cents = centroids_from_parquet("/root/testdata/sf0.01/embeddings.parquet", k=16)
    ivf = ivf_topk(emb, [0, 1, 2, 3, 4], k=10, centroids=cents, nprobe=5)
    sections.append(
        (
            "IVF top-k (literal-centroid assignment, bucket-keyed probe join)",
            plan_of(ivf),
            ["BroadcastHashJoin", "WindowGroupLimit"],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        )
    )

    # IVF join path: centroids as broadcast DATA (single-row array column +
    # higher-order-function argmax) — the plan must contain no centroid
    # literal and must not grow with centroid count (the literal path's
    # expression tree is O(centroids × dim), which collapses at production
    # IVF sizes; this is the 100 TB carrier)
    from log_parser_cli_spark.extras.similarity import vectors_to_df

    plans_by_k = {}
    for k_c in (16, 64):
        # centroids_from_parquet is the shared Spark/oracle centroid source —
        # reusing it keeps this evidence on the same centroids the gated
        # queries run with
        cdf = vectors_to_df(
            spark, centroids_from_parquet("/root/testdata/sf0.01/embeddings.parquet", k=k_c), "cents"
        )
        plans_by_k[k_c] = plan_of(ivf_topk(emb, [0, 1, 2, 3, 4], k=10, centroids_df=cdf, nprobe=5))
    sections.append(
        (
            "IVF top-k JOIN path (broadcast centroid DataFrame + HOF argmax — plan size independent of centroid count)",
            plans_by_k[16],
            ["BroadcastHashJoin", "BroadcastNestedLoopJoin", "WindowGroupLimit"],
            ["CartesianProduct"],
        )
    )

    failures: list[str] = []
    if abs(len(plans_by_k[16]) - len(plans_by_k[64])) > 200:
        failures.append(
            f"IVF join path plan grows with centroid count: "
            f"{len(plans_by_k[16])} chars @k=16 vs {len(plans_by_k[64])} @k=64"
        )
    if str(cents[0][0]) in plans_by_k[16]:
        failures.append("IVF join path leaks centroid literals into the plan")
    out = [
        "# PLANS — physical-plan evidence\n",
        "Generated by `python tools/explain_plans.py` (sf0.01). Each section",
        "lists shape assertions checked in CI fashion: broadcast joins on dim",
        "sides, parquet pushdown, partial aggregation, no cartesian products.\n",
    ]
    for title, plan, must, must_not in sections:
        checks = []
        for m in must:
            ok = any(alt in plan for alt in m.split("|"))
            checks.append(f"- {'✅' if ok else '❌'} contains `{m}`")
            if not ok:
                failures.append(f"{title}: missing {m}")
        for m in must_not:
            ok = m not in plan
            checks.append(f"- {'✅' if ok else '❌'} free of `{m}`")
            if not ok:
                failures.append(f"{title}: found forbidden {m}")
        out.append(f"\n## {title}\n")
        out.extend(checks)
        out.append("\n```\n" + plan.strip()[:4000] + "\n```\n")

    out.append(
        f"\nIVF join-path plan size: {len(plans_by_k[16])} chars @ k_centroids=16 vs "
        f"{len(plans_by_k[64])} @ k_centroids=64 — constant in centroid count, no "
        f"centroid literal in the plan text (the literal path is kept solely for "
        f"DuckDB-oracle portability; `ann_ivf_join` hash-matches it).\n"
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print(f"{len(failures)} plan-shape failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
