"""Clustering-accuracy metrics (GA / PA / purity / friendly) as DataFrame ops.

Re-expresses the reference's eval harness (benchmark/run-eval.js:120-259,
formulas in benchmark/baseline/METRICS_FORMULAS.md) in pure Spark SQL
aggregates — one shuffle over the (pred, gt) contingency cells, everything
else is arithmetic on cluster-cardinality tables:

- GA  (grouping accuracy): pairwise precision/recall/F1 over C(n,2) pairs,
- PA  (perfect-cluster accuracy): rows in pred clusters that exactly equal a
  gt cluster,
- predPure / gtPure: weighted dominant-label ratio per cluster,
- GA_friendly / PA_friendly: recomputed after collapsing pure (single-gt)
  pred clusters into one pseudo-cluster per gt id (__PURE__#<gt>),
- pureCoverage: fraction of rows living in pure pred clusters.

Validated against the worked example in METRICS_FORMULAS.md:355-438
(GA=0.667, PA=0.4, GA_friendly=1.0, predPure=1.0, pureCoverage=1.0).

Scale: the shuffles are keyed on cluster ids (cardinality ~ number of
templates, not rows) with map-side combine; final reductions collect a handful
of scalars. This runs on 10^12 labels unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _comb2(col):
    return F.when(col >= 2, col * (col - 1) / 2).otherwise(F.lit(0.0))


def _ga_pa(labels: DataFrame, pred_col: str, gt_col: str) -> dict[str, float]:
    cells = labels.groupBy(pred_col, gt_col).agg(F.count("*").alias("cnt"))
    gt_sizes = cells.groupBy(gt_col).agg(F.sum("cnt").alias("gt_size"))
    pred_stats = (
        cells.groupBy(pred_col)
        .agg(
            F.sum("cnt").alias("pred_size"),
            F.count("*").alias("n_gt_ids"),
            F.max("cnt").alias("top_cnt"),
            F.first(gt_col).alias("any_gt"),  # meaningful only when n_gt_ids == 1
        )
    )
    real_pairs = gt_sizes.agg(F.sum(_comb2(F.col("gt_size")))).first()[0] or 0.0
    parsed_pairs = pred_stats.agg(F.sum(_comb2(F.col("pred_size")))).first()[0] or 0.0
    accurate_pairs = cells.agg(F.sum(_comb2(F.col("cnt")))).first()[0] or 0.0
    total = labels.count()

    # PA: pred cluster is pure AND its size equals the gt cluster's total size.
    accurate_events = (
        pred_stats.filter(F.col("n_gt_ids") == 1)
        .join(gt_sizes, pred_stats["any_gt"] == gt_sizes[gt_col])
        .filter(F.col("pred_size") == F.col("gt_size"))
        .agg(F.sum("pred_size"))
        .first()[0]
        or 0
    )
    precision = 0.0 if parsed_pairs == 0 else accurate_pairs / parsed_pairs
    recall = 0.0 if real_pairs == 0 else accurate_pairs / real_pairs
    f1 = 0.0 if (precision + recall) == 0 else 2 * precision * recall / (precision + recall)
    pa = 0.0 if total == 0 else accurate_events / total
    return {"precision": precision, "recall": recall, "ga": f1, "pa": pa, "total": total}


def _purity(labels: DataFrame, base_col: str, other_col: str) -> float:
    cells = labels.groupBy(base_col, other_col).agg(F.count("*").alias("cnt"))
    per_base = cells.groupBy(base_col).agg(F.max("cnt").alias("top"), F.sum("cnt").alias("tot"))
    row = per_base.agg(F.sum("top").alias("top"), F.sum("tot").alias("tot")).first()
    return 0.0 if not row or not row["tot"] else row["top"] / row["tot"]


def collapse_pure_clusters(labels: DataFrame, pred_col: str = "pred_id", gt_col: str = "gt_id") -> DataFrame:
    """Relabel single-gt pred clusters to __PURE__#<gt> (run-eval.js:209-234)."""
    purity_map = (
        labels.groupBy(pred_col)
        .agg(F.countDistinct(gt_col).alias("n_gt"), F.first(gt_col).alias("any_gt"))
        .withColumn(
            "merged",
            F.when(F.col("n_gt") == 1, F.concat(F.lit("__PURE__#"), F.col("any_gt"))).otherwise(
                F.col(pred_col)
            ),
        )
        .select(pred_col, "merged")
    )
    return (
        labels.join(F.broadcast(purity_map), pred_col)
        .drop(pred_col)
        .withColumnRenamed("merged", pred_col)
    )


def macro_metrics(per_dataset: dict[str, dict[str, float]]) -> dict[str, float]:
    """Macro averages across datasets (A8, run-eval.js:327-375): unweighted
    mean of every metric key present in all datasets."""
    if not per_dataset:
        return {}
    keys = set.intersection(*(set(m) for m in per_dataset.values()))
    n = len(per_dataset)
    return {k: sum(m[k] for m in per_dataset.values()) / n for k in sorted(keys)}


def accuracy_metrics(labels: DataFrame, pred_col: str = "pred_id", gt_col: str = "gt_id") -> dict[str, float]:
    """All metrics over a labels DataFrame with (pred_col, gt_col)."""
    base = _ga_pa(labels, pred_col, gt_col)
    friendly = _ga_pa(collapse_pure_clusters(labels, pred_col, gt_col), pred_col, gt_col)
    pred_pure = _purity(labels, pred_col, gt_col)
    gt_pure = _purity(labels, gt_col, pred_col)

    pure_rows = (
        labels.groupBy(pred_col)
        .agg(F.countDistinct(gt_col).alias("n_gt"), F.count("*").alias("size"))
        .filter(F.col("n_gt") == 1)
        .agg(F.sum("size"))
        .first()[0]
        or 0
    )
    total = base["total"]
    return {
        "GA": base["ga"],
        "GA_precision": base["precision"],
        "GA_recall": base["recall"],
        "PA": base["pa"],
        "predPure": pred_pure,
        "gtPure": gt_pure,
        "GA_friendly": friendly["ga"],
        "PA_friendly": friendly["pa"],
        "pureCoverage": 0.0 if total == 0 else pure_rows / total,
    }
