"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k for a (small, broadcast) query set —
  the correctness baseline. The dot product is a JVM higher-order-function
  fold (F.aggregate over zip_with), no Python in the loop.
- ``rhp_candidates``: random-hyperplane LSH (Charikar 2002) candidate pairs —
  sign-bit signatures over deterministic md5-derived hyperplanes, banded
  equi-join; the scale path feeding ``cosine_pairs``. Hyperplanes are plain
  double literals, so a DuckDB oracle reproduces the exact same candidate set.
- ``kmeans_centroids``: deterministic Lloyd iterations (first-k init, fixed
  rounds) on a driver-side sample — real clustering for the IVF index.
- ``ivf_topk``: IVF-style scale path — vectors are bucketed by nearest
  centroid; queries probe only ``nprobe`` buckets, pruning the scan by
  ~n_centroids/nprobe.
- ``cosine_pairs``: embedding near-duplicate pairs (cos ≥ τ); pass LSH
  ``candidates`` for the scale plan (no corpus×corpus join).
- ``topk_recall``: recall@k of an approximate ranking vs the exact one.

All similarity math is computed in double and rounded, so a DuckDB oracle
reproduces values exactly at the rounded precision.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
NORM = "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


def _cosine_expr(a: str, b: str) -> str:
    return f"({DOT.format(a=a, b=b)}) / (({NORM.format(a=a)}) * ({NORM.format(a=b)}))"


def _lit_array(vec: list[float]) -> str:
    """SQL double-array literal (repr round-trips exactly in Spark + DuckDB)."""
    return "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in vec) + ")"


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


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (deterministic, oracle-portable)
# ---------------------------------------------------------------------------


def _md5_unit(tag: str) -> float:
    """Deterministic pseudo-uniform value in [-1, 1) from md5 — portable to
    any engine because the plane ends up inlined as a double literal."""
    h = int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)
    return round(h / float(1 << 31) - 1.0, 9)


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """n_planes deterministic hyperplanes for sign-bit signatures."""
    return [[_md5_unit(f"hp|{j}|{d}") for d in range(dim)] for j in range(n_planes)]


def vectors_to_df(spark, vectors: list[list[float]], col: str) -> DataFrame:
    """ONE-row DataFrame holding ``vectors`` as an array<array<double>>
    column — the broadcast-join carrier for the scale path. The literal
    paths inline each vector into the SQL text (perfect for DuckDB oracle
    portability, but the expression tree grows as O(n_vectors × dim)); at
    production sizes (IVF lists of 4k–65k × dim 768–4096) that plan would
    collapse, so the join paths attach the same numbers as DATA via a
    broadcast single-row cross join and reduce them with higher-order
    functions — plan size constant in both n_vectors and dim."""
    return spark.createDataFrame([(vectors,)], f"{col} array<array<double>>")


def rhp_candidates(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 60,
    rows_per_band: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_df: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate pairs (a < b) by banded random-hyperplane signatures.

    Each vector gets ``n_planes`` sign bits (dot with a hyperplane ≥ 0);
    bits group into bands of ``rows_per_band``; vectors sharing any band
    value become candidates via an equi-join on (band, value) — the shuffles
    are keyed on band buckets, never corpus×corpus.

    Two physically different, numerically identical plane carriers:
    - default: every plane inlined as a double-array LITERAL (oracle-
      portable; plan grows with n_planes × dim);
    - ``planes_df`` (from ``vectors_to_df(spark, hyperplanes(...), "planes")``):
      planes ride a broadcast single-row join and the signature is computed
      by higher-order functions — constant plan size, the 100 TB shape.
    """
    if n_planes > 62:
        raise ValueError(f"n_planes={n_planes} must fit a signed 64-bit signature")
    n_bands = n_planes // rows_per_band
    mask = (1 << rows_per_band) - 1
    # Pack ALL sign bits into ONE long signature per vector (the SimHash
    # shape): band vals become bit-slices of the signature, computed by JVM
    # shifts AFTER the explode instead of hyperplane dot products. The
    # round-5 DISTINCT-dedup revert carried the per-band value ARRAY through
    # the banding, and whole-stage codegen re-evaluated the 60 dot products
    # per exploded row (measured 4×); the packed long plus an explicit
    # exchange below makes that re-evaluation impossible — the signature is
    # shuffle-materialized once per vector (16 bytes/row, negligible at any
    # scale next to the banded-row shuffle the join itself pays).
    if planes_df is not None:
        sig_expr = (
            f"aggregate(zip_with("
            f"transform(planes, p -> IF(({DOT.format(a=vec_col, b='p')}) >= 0, 1, 0)), "
            f"sequence(0, {n_planes - 1}), "
            f"(x, j) -> shiftleft(CAST(x AS BIGINT), j)), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        sig = embeddings.join(F.broadcast(planes_df)).select(
            F.col(id_col).alias("doc"), F.expr(sig_expr).alias("rhpsig")
        )
    else:
        planes = hyperplanes(n_planes, dim)
        sig_expr = " + ".join(
            f"(CASE WHEN ({DOT.format(a=vec_col, b=_lit_array(planes[j]))}) >= 0 "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for j in range(n_planes)
        )
        sig = embeddings.select(
            F.col(id_col).alias("doc"), F.expr(sig_expr).alias("rhpsig")
        )
    banded = sig.repartition(F.col("doc")).select(
        "doc",
        "rhpsig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(rhpsig >> {b * rows_per_band}) & {mask}").alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "rhpsig", "bk.band", "bk.val")
    # shared guarded tail (hot-bucket star cap + reporting via
    # dedup.hot_bucket_stats) — LSH bucket skew is one failure mode across
    # every banding family, so it gets one implementation. Unguarded, pair
    # dedup is the shuffle-free first-matching-band filter (band b matches
    # iff the XOR'd signatures' b-th slice is zero — the SimHash
    # construction); guarded, the carried signature gives the two-level
    # star its refinement key, so exact-duplicate vector groups inside a
    # hot bucket keep their intra-group edges (previously the RHP guard
    # degraded to the single-level star and dropped them).
    from log_parser_cli_spark.extras.dedup import banded_pair_join

    if max_bucket is not None:
        return banded_pair_join(
            banded, ["band", "val"], max_bucket, payload=("rhpsig",)
        ).select("a", "b")
    first = " ".join(
        f"WHEN (((x.rhpsig ^ y.rhpsig) >> {b * rows_per_band}) & {mask}) = 0 THEN {b}"
        for b in range(n_bands)
    )
    return banded_pair_join(
        banded,
        ["band", "val"],
        None,
        first_band_filter=f"band = (CASE {first} END)",
    ).select("a", "b")


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs (a < b) with cosine ≥ threshold.

    With ``candidates`` (columns a, b — e.g. from ``rhp_candidates``) only
    those pairs are scored: the verify step of the LSH plan and the only
    shape that survives 100 TB. Without, an all-pairs self-join (test-scale
    baselines only).
    """
    # norms are per-VECTOR, not per-pair: compute them once in the side
    # projections instead of re-aggregating the array twice per candidate
    # pair (bit-identical — same NORM expression over the same array, and
    # sim keeps the exact dot/(na*nb) operation tree, only the operand
    # evaluation site moves)
    a = embeddings.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("va"),
        F.expr(NORM.format(a=vec_col)).alias("_na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("vb"),
        F.expr(NORM.format(a=vec_col)).alias("_nb"),
    )
    if candidates is not None:
        pairs = (
            candidates.select("a", "b")
            .join(a, "a")
            .join(b, "b")
        )
    else:
        pairs = a.join(b, F.col("a") < F.col("b"))
    sim = f"({DOT.format(a='va', b='vb')}) / (_na * _nb)"
    return (
        pairs.withColumn("sim", F.round(F.expr(sim), 4))
        .filter(F.col("sim") >= threshold)
        .select(F.col("a").cast("long"), F.col("b").cast("long"), "sim")
    )


# ---------------------------------------------------------------------------
# IVF with deterministic k-means centroids
# ---------------------------------------------------------------------------


def kmeans_centroids(vectors, k: int = 16, iters: int = 20) -> list[list[float]]:
    """Deterministic Lloyd k-means on a driver-side sample (cosine geometry:
    vectors and centroids are L2-normalized each round). Init = first k rows
    (callers pass id-ordered samples); empty clusters keep their previous
    centroid. Components round to 9 dp so centroid literals are portable."""
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = x[:k].copy()
    for _ in range(iters):
        sims = x @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return [[round(float(v), 9) for v in row] for row in cents]


def centroids_from_parquet(
    path: str,
    k: int = 16,
    iters: int = 20,
    sample: int = 4096,
    _io_stats: dict | None = None,
) -> list[list[float]]:
    """Shared centroid source for the Spark query AND the DuckDB oracle:
    k-means the ``sample`` smallest-vec_id vectors. Deterministic — both
    sides inline identical literals.

    Driver memory is BOUNDED: row groups stream through a max-heap that
    keeps only the ``sample`` smallest vec_ids (never the full column — at
    the design scale, 10^9+ vectors × 768+ dims, a full read is a driver
    OOM in the index-build path). Row groups whose min(vec_id) statistic
    cannot beat the current sample's largest kept id are skipped entirely,
    so on id-sorted files only the first group(s) are ever decoded; files
    without stats or with shuffled ids still produce the identical result,
    just reading more groups. Bit-identical to a full read + sort + take:
    the kept set is exactly the ``sample`` smallest ids, ascending.

    ``_io_stats`` (tests): filled with row_groups_read / num_row_groups.
    """
    import heapq

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    vec_leaf = None
    if md.num_row_groups:
        for j in range(md.row_group(0).num_columns):
            if md.row_group(0).column(j).path_in_schema == "vec_id":
                vec_leaf = j
                break

    def group_min(g: int):
        if vec_leaf is None:
            return None
        st = md.row_group(g).column(vec_leaf).statistics
        return st.min if st is not None and st.has_min_max else None

    heap: list[tuple] = []  # max-heap via negated ids: the `sample` smallest
    groups_read = 0

    def consume(g: int) -> None:
        nonlocal groups_read
        groups_read += 1
        tbl = pf.read_row_group(g, columns=["vec_id", "embedding"])
        for vid, emb in zip(tbl["vec_id"].to_pylist(), tbl["embedding"].to_pylist()):
            if len(heap) < sample:
                heapq.heappush(heap, (-vid, emb))
            elif vid < -heap[0][0]:
                heapq.heapreplace(heap, (-vid, emb))

    mins = {g: group_min(g) for g in range(md.num_row_groups)}
    for g in (g for g in mins if mins[g] is None):
        consume(g)  # no stats → cannot prune, must read
    for g in sorted((g for g in mins if mins[g] is not None), key=lambda g: mins[g]):
        if len(heap) >= sample and mins[g] > -heap[0][0]:
            break  # ascending mins: no later group can hold a smaller id
        consume(g)
    if _io_stats is not None:
        _io_stats["row_groups_read"] = groups_read
        _io_stats["num_row_groups"] = md.num_row_groups
    rows = sorted(heap, key=lambda t: -t[0])
    return kmeans_centroids([emb for _, emb in rows], k=k, iters=iters)


def _sims_expr(vec_col: str, centroids: list[list[float]], round_to: int = 6) -> str:
    """SQL expr: array of rounded cosines against every centroid literal."""
    sims = ", ".join(
        f"round({_cosine_expr(vec_col, _lit_array(c))}, {round_to})" for c in centroids
    )
    return f"array({sims})"


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids_df: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k: assign every vector to its nearest
    k-means centroid, probe only the ``nprobe`` closest buckets per query.
    Returns the same schema as cosine_topk.

    Two numerically identical centroid carriers (same ranking bit for bit):
    - ``centroids`` (literal path): every centroid inlined into the SQL text —
      whole-stage codegen, no join, and a DuckDB oracle can replay it; plan
      size O(n_centroids × dim), fine at sandbox scale.
    - ``centroids_df`` (join path, from ``vectors_to_df(spark, centroids,
      "cents")``): centroids ride a broadcast single-row cross join; the
      nearest-centroid argmax is a higher-order-function reduce over the
      array column — plan size CONSTANT in centroid count, the shape that
      survives production IVF lists (4k–65k centroids × dim 768+). Still one
      corpus scan, still no corpus-side shuffle.
    """
    if centroids is None and centroids_df is None:
        raise ValueError("pass deterministic centroids (kmeans_centroids) or centroids_df")
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cid"))
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    if centroids_df is not None:
        cdf = F.broadcast(centroids_df)
        sims_hof = f"transform(cents, c -> round({_cosine_expr(vec_col, 'c')}, 6))"
        assigned = (
            embeddings.join(cdf)
            .withColumn("_sims", F.expr(sims_hof))
            # first occurrence of the max → lowest centroid id wins ties,
            # identical to the literal path's array_position semantics
            .withColumn("cid", F.expr("array_position(_sims, array_max(_sims)) - 1"))
            .drop("_sims", "cents")
        )
        probes = (
            queries.join(cdf)
            .select("query_id", "qvec", F.posexplode("cents").alias("cid", "cvec"))
            .withColumn("qsim", F.expr(f"round({_cosine_expr('qvec', 'cvec')}, 6)"))
            .withColumn("r", F.row_number().over(w_probe))
            .filter(F.col("r") <= nprobe)
            .select("query_id", "qvec", "cid")
        )
    else:
        assigned = (
            embeddings.withColumn("_sims", F.expr(_sims_expr(vec_col, centroids)))
            # first occurrence of the max → lowest centroid id wins ties
            .withColumn("cid", F.expr("array_position(_sims, array_max(_sims)) - 1"))
            .drop("_sims")
        )
        # per-query nprobe nearest centroids (tiny: |queries| × n_centroids)
        probe_structs = [
            F.struct(
                F.lit(cid).alias("cid"),
                F.expr(f"round({_cosine_expr('qvec', _lit_array(c))}, 6)").alias("qsim"),
            )
            for cid, c in enumerate(centroids)
        ]
        probes = (
            queries.select("query_id", "qvec", F.explode(F.array(*probe_structs)).alias("p"))
            .select("query_id", "qvec", "p.cid", "p.qsim")
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


def topk_recall(approx: DataFrame, exact: DataFrame, k: int = 10) -> DataFrame:
    """recall@k of an approximate ranking vs the exact one (shared schema
    query_id/neighbor_id): one row (k, n_queries, recall)."""
    hits = approx.join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    )
    n_queries = exact.select("query_id").distinct().count()
    return hits.agg(
        F.lit(k).cast("long").alias("k"),
        F.lit(n_queries).cast("long").alias("n_queries"),
        F.round(F.count("*") / (k * n_queries), 6).alias("recall"),
    )
