"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k for a (small, broadcast) query set —
  the correctness baseline. The dot product is a JVM higher-order-function
  fold (F.aggregate over zip_with), no Python in the loop.
- ``ivf_topk``: IVF-style scale path — vectors are bucketed by nearest
  centroid; queries probe only ``nprobe`` buckets, pruning the scan by
  ~n_centroids/nprobe. Centroids are taken deterministically from the data
  (first ``n_centroids`` by id) — at production scale you'd plug k-means here;
  the pruning/plan shape is what matters.
- ``cosine_pairs``: embedding near-duplicate pairs (cos ≥ τ) for dedup.

All similarity math is computed in double and rounded, so a DuckDB oracle
(list_cosine_similarity) reproduces values exactly at the rounded precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
NORM = "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


def _cosine_expr(a: str, b: str) -> str:
    return f"({DOT.format(a=a, b=b)}) / (({NORM.format(a=a)}) * ({NORM.format(a=b)}))"


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    The query side is a broadcast of |query_ids| rows → the join is a
    broadcast nested loop over one corpus scan; ranking is a per-query
    window. Ties break on neighbor id for determinism.
    """
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        embeddings.alias("c")
        .join(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("sim", F.round(F.expr(_cosine_expr("qvec", vec_col)), round_to))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col(id_col).cast("long").alias("neighbor_id"),
            "sim",
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed approximate top-k: probe only the ``nprobe`` closest
    centroid buckets per query. Returns the same schema as cosine_topk."""
    spark = embeddings.sparkSession
    centroids = (
        embeddings.orderBy(id_col).limit(n_centroids)
        .select(F.monotonically_increasing_id().alias("cid"), F.col(vec_col).alias("cvec"))
    )
    b_cent = F.broadcast(centroids)

    # assignment: every vector → nearest centroid (one scan, broadcast NL join)
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("csim"))
    assigned = (
        embeddings.join(b_cent)
        .withColumn("csim", F.expr(_cosine_expr(vec_col, "cvec")))
        .withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select(id_col, vec_col, "cid")
    )
    # queries probe their nprobe nearest centroids
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qsim"))
    probes = (
        queries.join(b_cent)
        .withColumn("qsim", F.expr(_cosine_expr("qvec", "cvec")))
        .withColumn("r", F.row_number().over(w_probe))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "qvec", "cid")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("sim", F.round(F.expr(_cosine_expr("qvec", vec_col)), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col(id_col).cast("long").alias("neighbor_id"),
            "sim",
        )
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (a < b) with cosine ≥ threshold.

    Test-scale all-pairs; at 100 TB, feed LSH/IVF candidates instead of the
    full self-join (same downstream verify step).
    """
    a = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("sim", F.round(F.expr(_cosine_expr("va", "vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select(F.col("a").cast("long"), F.col("b").cast("long"), "sim")
    )
