"""Stage 1 — vectorized parse: render + head-extract + masked signature.

The ONLY Python stage in the pipeline (Arrow-batched mapInPandas; everything
downstream is pure Catalyst). Reimplements the reference's per-row machinery —
head-pattern content extraction (src/core/head-pattern.ts:14-36) and template
masking — with columnar tricks:

- rendering: one ``np.take`` over the flattened token values of the whole
  Arrow batch (vocab is a broadcast numpy array, not a per-task pickle),
- mask classification: precomputed per *vocab word* on the driver (the vocab is
  tiny; the corpus is not), so per row it is another ``np.take`` — zero regex,
- head extraction: one compiled regex per source (sources are few), applied
  per line within the batch — the same cost the reference pays per row
  (regex-worker-pool.ts:67-112) but Arrow-batched and executor-parallel, with a
  per-executor compiled cache mirroring its TemplateRuntimeCache
  (src/core/validation/template-runtime-cache.ts:30-60).

Output adds: content, content_sig (masked canonical signature), head_matched.
``tokens`` passes through untouched — the byte-exact token-array equality
invariant is carried, never recomputed.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from log_parser_cli_spark.functions.masking import mask_word

PARSED_EXTRA_FIELDS = [
    T.StructField("content", T.StringType()),
    T.StructField("content_sig", T.StringType()),
    T.StructField("head_matched", T.BooleanType()),
]

# Per-executor compiled-regex cache (keyed by head-pattern text). Python module
# state survives across tasks in an executor's worker process.
_HEAD_RX_CACHE: dict[str, re.Pattern[str]] = {}


def _compiled(pattern: str) -> re.Pattern[str]:
    rx = _HEAD_RX_CACHE.get(pattern)
    if rx is None:
        rx = re.compile(pattern)
        _HEAD_RX_CACHE[pattern] = rx
    return rx


def build_vocab_arrays(vocab_rows: list[tuple[int, str]]) -> tuple[np.ndarray, np.ndarray]:
    """(token_id, text) rows → (text_by_id, canon_by_id) numpy lookup arrays.

    ``canon_by_id[t]`` is the mask classification of token t's word — the
    per-vocab precompute that removes all per-row masking regex work.
    """
    size = max(t for t, _ in vocab_rows) + 1
    text = np.empty(size, dtype=object)
    canon = np.empty(size, dtype=object)
    for tid, word in vocab_rows:
        text[tid] = word
        canon[tid] = mask_word(word)
    return text, canon


def parse_stage(
    spark: SparkSession,
    seq_df: DataFrame,
    vocab_rows: list[tuple[int, str]],
    source_heads: dict[str, tuple[str, int]],
) -> DataFrame:
    """seq_df(doc_id, tokens, n_tok, source) → + (content, content_sig, head_matched).

    ``source_heads``: source → (head_pattern, content_group). Broadcast once;
    executors rebuild numpy lookups lazily and cache them per process.
    """
    sc = spark.sparkContext
    b_vocab = sc.broadcast(vocab_rows)
    b_heads = sc.broadcast(source_heads)

    out_schema = T.StructType(list(seq_df.schema.fields) + PARSED_EXTRA_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Lazy per-executor build of the vocab lookup arrays.
        cache_key = "_lpcs_vocab_arrays"
        holder = _HEAD_RX_CACHE  # reuse module dict as generic executor cache
        arrays = holder.get(cache_key)
        if arrays is None or holder.get("_lpcs_vocab_len") != len(b_vocab.value):
            arrays = build_vocab_arrays(b_vocab.value)
            holder[cache_key] = arrays
            holder["_lpcs_vocab_len"] = len(b_vocab.value)
        text_by_id, canon_by_id = arrays
        heads = {
            src: (_compiled(pat), grp) for src, (pat, grp) in b_heads.value.items()
        }

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            toks = pdf["tokens"].to_numpy()
            # Flatten the whole batch: one np.take for words, one for masks.
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            flat = np.concatenate([np.asarray(t, dtype=np.int64) for t in toks]) if n else np.empty(0, np.int64)
            words_flat = text_by_id.take(flat)
            canon_flat = canon_by_id.take(flat)

            sources = pdf["source"].to_numpy()
            content = np.empty(n, dtype=object)
            sig = np.empty(n, dtype=object)
            matched = np.zeros(n, dtype=bool)
            for i in range(n):
                w = words_flat[offs[i] : offs[i + 1]]
                line = " ".join(w)
                head = heads.get(sources[i])
                if head is None:
                    continue
                rx, grp = head
                m = rx.match(line)
                if m is None:
                    continue
                start_w = line.count(" ", 0, m.start(grp))
                matched[i] = True
                content[i] = m.group(grp)
                sig[i] = " ".join(canon_flat[offs[i] + start_w : offs[i + 1]])
            out = pdf.copy()
            out["content"] = content
            out["content_sig"] = sig
            out["head_matched"] = matched
            yield out

    return seq_df.mapInPandas(run, schema=out_schema)
