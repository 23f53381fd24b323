"""Deduplication operators for large-scale training-data pipelines.

All hashes are engine-portable (md5-hex → integer) so DuckDB oracles can
reproduce results bit-for-bit; all operators are pure DataFrame ops (JVM-side,
no Python UDFs) and scale-shaped:

- exact: one hash group-by (map-side combinable).
- n-gram Jaccard: shingle-explode + equi-join on shingle — used as the
  *verifier* on candidate pairs; never run all-pairs at scale.
- MinHash + LSH: shingle → n_hashes seeded min-hashes → band buckets →
  bucket-join for candidates → exact-Jaccard verification. The classic
  Broder construction; the only shuffles are keyed on shingles/bands.
- SimHash: word-hash sign-sum → 60-bit fingerprint; candidate pairs via
  pigeonhole banding (4×15-bit chunks) then Hamming ≤ r filter.
- embedding cosine near-dup: see extras/similarity.py for the kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Portable 32-bit hash of a string expression (same value in DuckDB via
# CAST(('0x' || substr(md5(x),1,8)) AS BIGINT)).
def hash32(col_expr: str, seed: str = "") -> str:
    inner = f"concat('{seed}|', {col_expr})" if seed else col_expr
    return f"CAST(conv(substr(md5({inner}), 1, 8), 16, 10) AS BIGINT)"


def exact_dup_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate statistics by content hash (A12-style distinct)."""
    hashed = df.select(id_col, F.expr(f"md5({text_col})").alias("h"))
    groups = hashed.groupBy("h").agg(F.count("*").alias("n"))
    return groups.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).cast("long").alias("n_dup_rows"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long").alias("n_dup_groups"),
    )


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 2) -> DataFrame:
    """Distinct word k-gram shingles per document (lower-cased, space-split)."""
    words = f"split(lower({text_col}), ' ')"
    if k == 2:
        # bigram fast path: pair adjacent words with one zip_with concat
        # instead of a slice+array_join allocation per shingle — identical
        # output ('w1 w2' joined with a single space), ~2× cheaper on the
        # hot verify path that re-shingles per jaccard pass
        sh = (
            f"CASE WHEN size({words}) < 2 THEN array() "
            f"ELSE array_distinct(zip_with({words}, slice({words}, 2, size({words}) - 1),"
            f" (a, b) -> CASE WHEN b IS NULL THEN NULL ELSE concat(a, ' ', b) END)) END"
        )
        sh = f"filter({sh}, x -> x IS NOT NULL)"
    else:
        sh = (
            f"CASE WHEN size({words}) < {k} THEN array() "
            f"ELSE array_distinct(transform(sequence(0, size({words}) - {k}),"
            f" i -> array_join(slice({words}, i + 1, {k}), ' '))) END"
        )
    return df.select(F.col(id_col).alias("doc"), F.explode(F.expr(sh)).alias("shingle"))


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 2, threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs (a, b, jaccard) with Jaccard ≥ threshold over k-gram shingles.

    With ``candidates`` (columns a, b) only those pairs are scored — the
    scale path; without, scoring happens for every shingle-sharing pair
    (fine at test scale, quadratic in duplicate-group size at 100 TB).
    Candidates that additionally carry ``sz_a``/``sz_b`` (per-doc distinct
    shingle counts, e.g. ridden through the LSH banding as join payload)
    skip this function's own size aggregation + two size joins entirely.
    """
    # no .cache(): shingling is a narrow transform recomputed per reference
    # (3 scans max), and at the design scale a shingle cache wouldn't fit
    # executor storage anyway — a session-lifetime pin was the round-3 leak
    sh = shingles(df, id_col, text_col, k)
    if candidates is not None and {"sz_a", "sz_b"}.issubset(candidates.columns):
        inter = (
            candidates.select("a", "b", "sz_a", "sz_b")
            .join(sh.withColumnRenamed("doc", "a"), "a")
            .join(sh.withColumnRenamed("doc", "b"), ["b", "shingle"])
            .groupBy("a", "b", "sz_a", "sz_b")
            .agg(F.count("*").alias("inter"))
        )
        return (
            inter.withColumn(
                "jaccard",
                F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard")
        )
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    if candidates is not None:
        # restrict the join INPUTS to candidate pairs before any pair is
        # enumerated — a post-hoc semi-filter would still pay the quadratic
        # shingle self-join inside hot duplicate groups. Work here is
        # |candidates| × shingles-per-doc, all keyed equi-joins.
        inter = (
            candidates.select("a", "b")
            .join(sh.withColumnRenamed("doc", "a"), "a")
            .join(sh.withColumnRenamed("doc", "b"), ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        inter = (
            sh.alias("x")
            .join(sh.alias("y"), "shingle")
            .filter(F.col("x.doc") < F.col("y.doc"))
            .groupBy(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
            .agg(F.count("*").alias("inter"))
        )
    pairs = (
        inter.join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return pairs


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 2, n_hashes: int = 16,
    with_size: bool = False,
) -> DataFrame:
    """doc → array of n_hashes min-hash values (portable seeded md5 hashes).

    ``with_size=True`` adds the per-doc distinct-shingle count (``sz``) to the
    SAME aggregation, so a downstream Jaccard verify can consume it without
    its own shingle scan — and because both consumers then share one
    byte-identical aggregation subtree, Spark's ReuseExchange serves them
    from a single shuffle of the shingle stream."""
    sh = shingles(df, id_col, text_col, k)
    aggs = [
        F.min(F.expr(hash32("shingle", seed=f"mh{i}"))).alias(f"h{i}") for i in range(n_hashes)
    ]
    if with_size:
        aggs.append(F.count("*").alias("sz"))
    sig = sh.groupBy("doc").agg(*aggs)
    cols = ["doc", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")]
    if with_size:
        cols.append(F.col("sz"))
    return sig.select(*cols)


def hot_bucket_stats(banded: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    """Buckets above the cap, one row per (key..., n_docs) — the no-silent-caps
    REPORT that accompanies a guarded ``banded_pair_join``. Callers at scale
    surface this next to the pair output (the reference's posture: conflicts
    and failures are first-class reports, conflict-detector.ts:30-64)."""
    return (
        banded.groupBy(*keys)
        .agg(F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
    )


def banded_pair_join(
    banded: DataFrame,
    keys: list[str],
    max_bucket: int | None = None,
    payload: tuple[str, ...] = (),
    first_band_filter: str | None = None,
) -> DataFrame:
    """Self-join banded rows on bucket ``keys`` → distinct candidate pairs
    (a < b), carrying each ``payload`` column for both sides as <c>_a / <c>_b.
    The shared tail of every LSH candidate generator in this module and
    extras/similarity.py.

    ``max_bucket`` is the HOT-BUCKET GUARD. A bucket of m rows emits C(m, 2)
    pairs, so one degenerate bucket — thousands of empty/boilerplate docs
    sharing simhash 0, a dead band value — makes the join's OUTPUT quadratic,
    and AQE can split a skewed input but not a quadratic output. Buckets
    above the cap instead emit a TWO-LEVEL STAR in O(m) rows: members with
    an IDENTICAL full signature (the payload, or the carried ``_bands``
    array) link to their signature-group's smallest doc at signature
    distance 0 — so the exact-duplicate groups that actually cause
    degenerate buckets lose NOTHING to downstream distance filters — and
    the group minima link to the bucket's smallest doc. The guard is
    therefore an APPROXIMATION, and honestly so: a pair of DISTINCT
    signatures whose only shared buckets are capped survives downstream
    radius filtering only if the representative edges stay within the
    radius; exact pair semantics inside a hot bucket inherently require up
    to C(m, 2) distance checks, which is the very cost the cap exists to
    refuse. Pair-list semantics stay EXACT for every bucket ≤ max_bucket;
    capped buckets are reported by ``hot_bucket_stats`` over the same
    banded rows — no silent truncation. With the default None the guard is
    off (the oracle-verified exact shape; recall gates run here).

    ``first_band_filter`` replaces the pair-dedup DISTINCT with a predicate
    (SQL over the ``x``/``y`` aliases and the key columns) that is true for
    exactly ONE of a pair's colliding bands — the classic LSH trick when
    band membership is a pure function of the carried payload (SimHash:
    band j collides iff the XOR's chunks for combo j are all zero, so
    "band = first matching band" needs no data beyond the two
    fingerprints). The DISTINCT is the dominant cost of the unguarded
    plan — it shuffles every (pair × colliding-band) row, two orders of
    magnitude more rows than the final pair set — while the filter is
    evaluated inside the join's codegen stage and nothing wide ever
    shuffles. Only valid WITHOUT the guard: under a cap, a pair's earliest
    matching band may sit in a capped bucket, so the row that the filter
    would keep might not exist (raises to prevent silent pair loss)."""
    if first_band_filter is not None and max_bucket is not None:
        raise ValueError(
            "first_band_filter cannot combine with max_bucket: a pair's first "
            "matching band may live in a capped bucket, silently dropping it"
        )

    def pair_select():
        return [
            F.col("x.doc").alias("a"),
            F.col("y.doc").alias("b"),
            *[F.col(f"x.{c}").alias(f"{c}_a") for c in payload],
            *[F.col(f"y.{c}").alias(f"{c}_b") for c in payload],
        ]

    if max_bucket is None:
        joined = (
            banded.alias("x")
            .join(banded.alias("y"), list(keys))
            .filter(F.col("x.doc") < F.col("y.doc"))
        )
        if first_band_filter is not None:
            return joined.filter(F.expr(first_band_filter)).select(*pair_select())
        return joined.select(*pair_select()).distinct()
    # one extra shuffle on the SAME bucket keys (AQE reuses the exchange);
    # per-partition state is O(bucket size) rows, never O(bucket²)
    w = Window.partitionBy(*keys)
    sized = banded.withColumn("_bsz", F.count("*").over(w))
    normal = sized.filter(F.col("_bsz") <= max_bucket).drop("_bsz")
    normal_pairs = (
        normal.alias("x")
        .join(normal.alias("y"), list(keys))
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(*pair_select())
    )
    hot = sized.filter(F.col("_bsz") > max_bucket).drop("_bsz")
    # the refinement signature: the payload if carried, else whatever full
    # per-doc signature the banded rows hold (_bands array, or the raw
    # simhash that simhash_candidates' rows carry without payload)
    sig_cols = list(payload) or [
        c for c in ("_bands", "simhash") if c in banded.columns
    ]
    if sig_cols:
        # two-level star (see docstring): signature-group min first, then
        # bucket min over the group minima
        grp = hot.groupBy(*keys, *sig_cols).agg(F.min("doc").alias("_gmin"))
        intra = (
            hot.join(grp, [*keys, *sig_cols])
            .filter(F.col("doc") != F.col("_gmin"))
            .select(
                F.col("_gmin").alias("a"),
                F.col("doc").alias("b"),
                # identical signature on both sides by construction
                *[F.col(c).alias(f"{c}_a") for c in payload],
                *[F.col(c).alias(f"{c}_b") for c in payload],
            )
        )
        reps = grp.select(*keys, *sig_cols, F.col("_gmin").alias("doc"))
        brep = reps.groupBy(*keys).agg(F.min(F.struct("doc", *payload)).alias("_rep"))
        inter = (
            reps.join(brep, list(keys))
            .filter(F.col("doc") != F.col("_rep.doc"))
            .select(
                F.col("_rep.doc").alias("a"),
                F.col("doc").alias("b"),
                *[F.col(f"_rep.{c}").alias(f"{c}_a") for c in payload],
                *[F.col(c).alias(f"{c}_b") for c in payload],
            )
        )
        star = intra.unionByName(inter)
    else:
        # no signature to refine on: single-level star vs the bucket min
        rep = hot.groupBy(*keys).agg(F.min(F.struct("doc", *payload)).alias("_rep"))
        star = (
            hot.join(rep, list(keys))
            .filter(F.col("doc") != F.col("_rep.doc"))
            .select(
                F.col("_rep.doc").alias("a"),
                F.col("doc").alias("b"),
                *[F.col(f"_rep.{c}").alias(f"{c}_a") for c in payload],
                *[F.col(c).alias(f"{c}_b") for c in payload],
            )
        )
    return normal_pairs.unionByName(star).distinct()


FIRST_BAND_ARRAY_FILTER = (
    "band = array_position(zip_with(x._bands, y._bands, (p, q) -> p = q), true) - 1"
)
"""Generic first-matching-band predicate for banded rows that carry their
full per-band value array as ``_bands``: a pair is kept only in the first
band where the two arrays agree — the payload-array twin of the SimHash
XOR construction (see ``banded_pair_join``)."""


def minhash_banded(
    sig: DataFrame, bands: int = 4, rows_per_band: int = 4,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc, band, bucket, _bands) banded rows for MinHash LSH; ``_bands``
    carries the doc's full bucket array for the first-band dedup filter.
    ``carry`` names extra per-doc columns to ride along (e.g. the shingle
    count, so the Jaccard verify needs no size joins)."""
    buckets = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[b * rows_per_band + r].cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    return sig.select("doc", *carry, buckets.alias("_bands")).select(
        "doc", *carry, "_bands", F.posexplode("_bands").alias("band", "bucket")
    )


def minhash_lsh_candidates(
    sig: DataFrame, bands: int = 4, rows_per_band: int = 4, max_bucket: int | None = None
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs (a<b).
    ``max_bucket`` = hot-bucket guard (see ``banded_pair_join``); unguarded,
    pair dedup is the shuffle-free first-band filter."""
    return banded_pair_join(
        minhash_banded(sig, bands, rows_per_band),
        ["band", "bucket"],
        max_bucket,
        first_band_filter=None if max_bucket is not None else FIRST_BAND_ARRAY_FILTER,
    )


def minhash_dedup(
    df: DataFrame, id_col: str, text_col: str, k: int = 2, threshold: float = 0.5,
    n_hashes: int = 16, bands: int = 4,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates → exact-Jaccard verify.

    The signature aggregation also emits each doc's shingle count, which
    rides the banding and the pair join as payload (``sz_a``/``sz_b``, +8
    bytes next to the ~128-byte ``_bands`` array already carried) — the
    Jaccard verify then needs NO size aggregation and NO size joins: two
    whole shingle passes and two joins gone from the plan (guide §2.3:
    shuffle keys and metadata, decide downstream from what already flowed)."""
    sig = minhash_signatures(df, id_col, text_col, k, n_hashes, with_size=True)
    banded = minhash_banded(sig, bands, n_hashes // bands, carry=("sz",))
    cands = banded_pair_join(
        banded, ["band", "bucket"], None,
        payload=("sz",), first_band_filter=FIRST_BAND_ARRAY_FILTER,
    )
    return jaccard_pairs(df, id_col, text_col, k, threshold, candidates=cands)


SIMHASH_BITS = 60  # keep within signed-64 positive range for portability


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash over lower-cased words (Charikar 2002 construction).

    Per-bit aggregate is ``sum((h >> b) & 1)`` + one word count rather than
    the textbook ±1 CASE sum: sign(Σ±1) > 0 ⟺ 2·popcount_b > n, bit-
    identical on ties (Σ±1 = 0 ⟺ 2c = n, both yield 0), and the 60
    branch-free bit-extract aggregates compile ~3× faster than 60 CASE
    aggregates (the whole cold-query cost at sandbox scale is codegen)."""
    w = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.expr(f"split(lower({text_col}), ' ')")).alias("word"),
    ).withColumn("h", F.expr(hash32("word", seed="sh")))
    bit_sums = w.groupBy("doc").agg(
        F.count("*").alias("nw"),
        *[F.sum(F.expr(f"(h >> {b}) & 1")).alias(f"c{b}") for b in range(SIMHASH_BITS)],
    )
    fp = bit_sums.select(
        "doc",
        sum(
            [
                F.expr(f"CASE WHEN 2 * c{b} > nw THEN CAST({1 << b} AS BIGINT) ELSE 0 END")
                for b in range(SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return fp


def simhash_banded(fp: DataFrame, chunks: int = 4) -> DataFrame:
    """(doc, simhash, chunk, val) banded rows: the fingerprint split into
    ``chunks`` exact sub-keys (single-chunk pigeonhole banding)."""
    width = SIMHASH_BITS // chunks
    mask = (1 << width) - 1
    return fp.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.expr(f"(simhash >> {c * width}) & {mask}").alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc", "simhash", "ck.chunk", "ck.val")


def simhash_candidates(
    fp: DataFrame, chunks: int = 4, max_bucket: int | None = None
) -> DataFrame:
    """Raw SimHash banding candidates (a < b): docs sharing any exact chunk.
    Feed these to a verifier (e.g. jaccard_pairs) — the cross-family LSH plan.
    ``max_bucket`` = hot-bucket guard (see ``banded_pair_join``)."""
    return banded_pair_join(simhash_banded(fp, chunks), ["chunk", "val"], max_bucket)


def simhash_pairs(
    fp: DataFrame, max_hamming: int = 3, chunks: int = 4, max_bucket: int | None = None
) -> DataFrame:
    """Near-dup pairs by Hamming distance via pigeonhole banding.

    With ``chunks`` > ``max_hamming`` any pair within distance shares ≥1 exact
    chunk, so candidates come from equi-joins on chunk values — never an
    all-pairs cross join. The guarantee is enforced: a radius ≥ chunks would
    silently drop pairs that differ in every chunk (recall hole), so such
    parameterizations raise instead of advertising semantics they can't keep.
    ``simhash_recall`` in the query suite verifies recall == 1.0 vs the
    brute-force baseline.
    """
    if chunks <= max_hamming:
        raise ValueError(
            f"pigeonhole banding needs chunks > max_hamming "
            f"(got chunks={chunks}, max_hamming={max_hamming}): a pair at "
            f"distance {chunks}..{max_hamming} can differ in all {chunks} "
            f"chunks and would be silently missed"
        )
    width = SIMHASH_BITS // chunks
    mask = (1 << width) - 1
    # dedup-free unguarded plan: keep a pair only in its FIRST matching
    # chunk — chunk c matches iff the XOR's c-th chunk is zero, a pure
    # function of the two fingerprints (see banded_pair_join)
    first = " ".join(
        f"WHEN (((x.simhash ^ y.simhash) >> {c * width}) & {mask}) = 0 THEN {c}"
        for c in range(chunks)
    )
    pairs = banded_pair_join(
        simhash_banded(fp, chunks),
        ["chunk", "val"],
        max_bucket,
        payload=("simhash",),
        first_band_filter=None if max_bucket is not None else f"chunk = (CASE {first} END)",
    )
    return pairs.select(
        "a",
        "b",
        F.bit_count(F.expr("simhash_a ^ simhash_b")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def simhash_banded_wide(
    fp: DataFrame, chunks: int = 10, combo_size: int = 2
) -> DataFrame:
    """(doc, simhash, band, val) rows banding every C(chunks, combo_size)
    chunk COMBINATION (concatenated chunk values as the band key)."""
    from itertools import combinations

    width = SIMHASH_BITS // chunks
    mask = (1 << width) - 1
    combos = list(combinations(range(chunks), combo_size))
    return fp.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(
                            " + ".join(
                                f"(((simhash >> {c * width}) & {mask}) << {j * width})"
                                for j, c in enumerate(combo)
                            )
                        ).alias("val"),
                    )
                    for i, combo in enumerate(combos)
                ]
            )
        ).alias("bk"),
    ).select("doc", "simhash", "bk.band", "bk.val")


def simhash_pairs_wide(
    fp: DataFrame,
    max_hamming: int = 8,
    chunks: int = 10,
    combo_size: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Wide-radius Hamming pairs via chunk-COMBINATION banding.

    Generalized pigeonhole (the HmSearch/multi-index construction): ≤ r
    differing bits touch ≤ r chunks, so ≥ chunks − r chunks agree exactly —
    banding on every C(chunks, q) combination with q ≤ chunks − r keys has
    recall 1 by construction. Compared to ``simhash_pairs`` (q = 1, radius
    capped at chunks − 1, key width shrinking as chunks grows), each band
    key here carries q × width bits of selectivity, so radius 8 over 60
    bits runs with 10 chunks / q=2 / 45 bands on 12-bit keys instead of
    drowning in 6-bit single-chunk buckets. Banded-row cost is
    C(chunks, q) × corpus — a documented space/selectivity trade.
    """
    if combo_size is None:
        combo_size = chunks - max_hamming
    if combo_size < 1 or combo_size > chunks - max_hamming:
        raise ValueError(
            f"combination pigeonhole needs 1 <= combo_size <= chunks - max_hamming "
            f"(got combo_size={combo_size}, chunks={chunks}, max_hamming={max_hamming}): "
            f"a pair at distance {max_hamming} may agree on only {chunks - max_hamming} "
            f"chunks, so larger combos can miss it"
        )
    if SIMHASH_BITS % chunks != 0:
        raise ValueError(
            f"chunks={chunks} must divide {SIMHASH_BITS} bits — a remainder "
            f"leaves high bits outside every band (silent recall hole)"
        )
    from itertools import combinations

    width = SIMHASH_BITS // chunks
    mask = (1 << width) - 1
    # dedup-free unguarded plan: band i (a chunk COMBINATION) matches iff the
    # XOR's chunks are zero for every member of combo i; keep the pair only
    # in its first matching combination (see banded_pair_join)
    first = " ".join(
        "WHEN ("
        + " AND ".join(
            f"(((x.simhash ^ y.simhash) >> {c * width}) & {mask}) = 0" for c in combo
        )
        + f") THEN {i}"
        for i, combo in enumerate(combinations(range(chunks), combo_size))
    )
    pairs = banded_pair_join(
        simhash_banded_wide(fp, chunks, combo_size),
        ["band", "val"],
        max_bucket,
        payload=("simhash",),
        first_band_filter=None if max_bucket is not None else f"band = (CASE {first} END)",
    )
    return pairs.select(
        "a",
        "b",
        F.bit_count(F.expr("simhash_a ^ simhash_b")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def connected_components(
    pairs: DataFrame, all_docs: DataFrame | None = None, max_iters: int = 50
) -> DataFrame:
    """(doc, component) labeling over near-dup ``pairs`` (columns a, b):
    component = smallest doc id reachable — the dedup MATERIALIZATION step
    (keep one doc per component = the surviving corpus), which the pair
    generators alone don't give you.

    Min-label propagation: each round every node takes the min of its own
    label and its neighbors' labels; converges in O(component diameter)
    rounds, and near-dup components are dense (every member within radius
    of a shared template), so diameter is small in practice — ``max_iters``
    is a safety bound, convergence is checked per round. Per-round lineage
    is cut with ``localCheckpoint`` (the standard iterative-DataFrame shape;
    without it the plan doubles every round). All shuffles are keyed
    equi-joins on doc ids; the driver coordinates rounds but never holds
    data. ``all_docs`` (one ``doc`` column): include isolated docs as
    their own singleton components, so distinct components == the deduped
    corpus size."""
    # materialize the edge set ONCE — without this, every propagation
    # round's join re-executes the whole upstream pair generation (the
    # expensive LSH banded self-join)
    edges = (
        pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(pairs.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .localCheckpoint()
    )
    nodes = edges.select("x").distinct()
    if all_docs is not None:
        nodes = nodes.unionByName(all_docs.select(F.col("doc").alias("x"))).distinct()
    labels = nodes.select("x", F.col("x").alias("comp")).localCheckpoint()
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(
                labels.select(F.col("x").alias("y"), F.col("comp").alias("ncomp")), "y"
            )
            .groupBy("x")
            .agg(F.min("ncomp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "x", "left")
            .select(
                "x",
                F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "x")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # returning silently would split real components (non-minimal
        # labels) and inflate the deduped corpus size
        raise RuntimeError(
            f"connected_components did not converge within max_iters={max_iters} "
            f"(a component with diameter > max_iters exists; raise the bound)"
        )
    return labels.select(F.col("x").alias("doc"), F.col("comp").alias("component"))


def dedup_survivors(
    docs: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The deduplicated corpus: keep exactly one doc per component — the
    component label IS the surviving doc id (smallest reachable), so the
    filter is a broadcast-able semi-join, no shuffle of the fact table's
    payload columns."""
    keep = components.filter(F.col("doc") == F.col("component")).select(
        F.col("doc").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def simhash_bruteforce_pairs(fp: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All pairs within Hamming ≤ ``max_hamming`` by a full self-join — the
    recall BASELINE for the ``simhash_recall`` check at test scale only
    (quadratic in corpus size; the scale path is ``simhash_pairs``)."""
    return (
        fp.alias("x")
        .join(fp.alias("y"), F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("a"),
            F.col("y.doc").alias("b"),
            F.bit_count(F.expr("x.simhash ^ y.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
