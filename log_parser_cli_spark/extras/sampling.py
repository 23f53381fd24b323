"""Sampling operators for discovery: stride thinning + k-center selection.

Mirrors the reference's DiverseSampler (src/core/diverse-sampler.ts):
- stride thinning (O4): every ⌊n/pool⌋-th row up to a pool cap — distributed,
- greedy k-center max-min Jaccard selection (O5): runs on the ≤pool_size
  collected rows on the driver (discovery-time only, never on the fact
  stream), picking samples that maximize the minimum pairwise distance.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RX = re.compile(r"[^a-z0-9]+")


def stride_sample(df: DataFrame, order_col: str, pool_size: int = 200) -> DataFrame:
    """Deterministic stride thinning: ≤ pool_size rows, evenly spaced by rank.

    Distributed (window rank + modulo filter) — unlike random sample(), the
    result is stable across runs and cluster sizes.
    """
    from pyspark.sql import Window

    n = df.count()
    if n <= pool_size:
        return df
    step = n // pool_size
    # (rn - 1) % step keeps row 1 and every step-th after it; the naive
    # rn % step == 1 form returns ZERO rows when step == 1 (x % 1 is always 0),
    # i.e. for the whole range pool_size < n < 2*pool_size.
    w = Window.orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(((F.col("_rn") - 1) % step) == 0)
        .limit(pool_size)
        .drop("_rn")
    )


def _tokens(line: str) -> frozenset[str]:
    return frozenset(t for t in _TOKEN_RX.split(line.lower()) if t)


def jaccard_distance(a: frozenset[str], b: frozenset[str]) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return 1.0 - (inter / union if union else 0.0)


def k_center_select(lines: list[str], k: int = 12) -> list[str]:
    """Greedy max-min Jaccard-distance selection (k-center heuristic).

    Deterministic: starts from the first line, ties break on list order.
    Driver-side by design — input is the ≤200-row thinned pool.
    """
    if len(lines) <= k:
        return list(lines)
    token_sets = [_tokens(line) for line in lines]
    selected = [0]
    min_dist = [jaccard_distance(token_sets[0], ts) for ts in token_sets]
    while len(selected) < k:
        best_i = max(range(len(lines)), key=lambda i: (min_dist[i], -i))
        if min_dist[best_i] <= 0.0:
            break
        selected.append(best_i)
        for i, ts in enumerate(token_sets):
            d = jaccard_distance(token_sets[best_i], ts)
            if d < min_dist[i]:
                min_dist[i] = d
    return [lines[i] for i in sorted(selected)]


def diverse_sample(
    df: DataFrame, line_col: str, order_col: str, pool_size: int = 200, k: int = 12
) -> list[str]:
    """Stride-thin to a pool, then k-center select on the driver (O4 + O5)."""
    pool = [r[0] for r in stride_sample(df, order_col, pool_size).select(line_col).collect()]
    return k_center_select(pool, k)
