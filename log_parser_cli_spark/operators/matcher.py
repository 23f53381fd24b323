"""Ordered first-match-wins regex template matcher (reference parity).

The reference's core match loop iterates the library's templates in
``created_at`` order and takes the first full-line regex match
(src/core/regex-worker-pool.ts:67-112, order from
sqlite-template-manager.ts:224-247). Semantically a broadcast nested-loop
join with short-circuit — never a crossJoin: the template side is tiny and
broadcast; rows stream through a vectorized Arrow stage.

Used for the ``--match-only`` replay path (semantic-log-parser.ts:108-151) and
as the parity check against the signature fast path. Per-executor compiled
cache keyed by template-set version (mirrors TemplateRuntimeCache,
template-runtime-cache.ts:22-60 — compile O(templates), not O(templates×rows)).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_COMPILED_CACHE: dict[tuple[str, int], list[tuple[str, re.Pattern[str]]]] = {}

MATCH_FIELDS = [
    T.StructField("template_id", T.StringType()),
    T.StructField("variables", T.MapType(T.StringType(), T.StringType())),
]


def compile_ordered(
    template_rows: list[dict], source: str, version
) -> list[tuple[str, re.Pattern[str]]]:
    """Compile one source's templates in precedence order, with caching."""
    key = (source, version)
    compiled = _COMPILED_CACHE.get(key)
    if compiled is None:
        # Keep only the latest template-set version per source: long-lived
        # executors matching against evolving libraries must not accumulate
        # every historical compiled set.
        for stale in [k for k in _COMPILED_CACHE if k[0] == source]:
            del _COMPILED_CACHE[stale]
        rows = [r for r in template_rows if r["source"] == source]
        rows.sort(key=lambda r: (r["created_at"], r["template_id"]))
        compiled = [(r["template_id"], re.compile(r["pattern"])) for r in rows]
        _COMPILED_CACHE[key] = compiled
    return compiled


def match_templates(
    spark: SparkSession,
    df: DataFrame,
    template_rows: list[dict],
    content_col: str = "content",
    source_col: str = "source",
    version=0,
) -> DataFrame:
    """Append (template_id, variables) via ordered first-match-wins.

    ``template_rows``: dicts with template_id, source, pattern (anchored,
    Python syntax, named groups), created_at. Unmatched rows get NULLs —
    the matched/unmatched split is a single pass (E1 semantics), callers
    filter ``template_id IS NULL`` for the failure side.
    """
    import zlib

    # cache version = fingerprint of the template set, so two different
    # libraries for the same source never collide in the executor cache
    fingerprint = zlib.crc32(
        repr(
            sorted((r["template_id"], r["source"], r["pattern"], r["created_at"]) for r in template_rows)
        ).encode()
    )
    version = (version, fingerprint)
    sc = spark.sparkContext
    b_templates = sc.broadcast(template_rows)

    out_schema = T.StructType(list(df.schema.fields) + MATCH_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = b_templates.value
        per_source: dict[str, list[tuple[str, re.Pattern[str]]]] = {}
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            tids: list[str | None] = [None] * n
            varmaps: list[dict | None] = [None] * n
            contents = pdf[content_col].to_numpy()
            sources = pdf[source_col].to_numpy()
            for i in range(n):
                line = contents[i]
                if line is None or (isinstance(line, float) and pd.isna(line)):
                    continue
                src = sources[i]
                compiled = per_source.get(src)
                if compiled is None:
                    compiled = compile_ordered(rows, src, version)
                    per_source[src] = compiled
                for tid, rx in compiled:
                    m = rx.match(line)
                    # anchored patterns: match == full-line match (P8 semantics)
                    if m is not None and m.end() == len(line):
                        tids[i] = tid
                        gd = m.groupdict()
                        varmaps[i] = {k: v for k, v in gd.items() if v is not None}
                        break
            out = pdf.copy()
            out["template_id"] = tids
            out["variables"] = varmaps
            yield out

    return df.mapInPandas(run, schema=out_schema)
