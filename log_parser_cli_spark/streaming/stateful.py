"""Custom stateful streaming operator: running per-source template counters.

The reference keeps mutable per-library state (template counts, next-id
counters) in SQLite across its batch loop (src/tools/template-managers/
sqlite-template-manager.ts). The Structured-Streaming-native equivalent is
``applyInPandasWithState``: state lives in Spark's state store, keyed by
group, checkpointed with the query — no external store, exactly-once across
restarts.

``running_template_counts`` groups the parsed/enriched stream by source and
maintains {template_id: count, total} in GroupState, emitting the updated
totals every micro-batch. At 10^12 scale the state per key is tiny (template
cardinality), and keys (sources) shard across executors.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("template_id", T.StringType()),
        T.StructField("running_count", T.LongType()),
        T.StructField("source_total", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("template_ids", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def _update_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (source,) = key
    if state.exists:
        template_ids, counts = state.get
        running = dict(zip(template_ids, counts))
    else:
        running = {}
    for pdf in pdfs:
        for tid, cnt in pdf.groupby("template_id").size().items():
            running[tid] = running.get(tid, 0) + int(cnt)
    items = sorted(running.items())
    state.update((list(t for t, _ in items), list(c for _, c in items)))
    total = sum(running.values())
    yield pd.DataFrame(
        {
            "source": [source] * len(items),
            "template_id": [t for t, _ in items],
            "running_count": [c for _, c in items],
            "source_total": [total] * len(items),
        }
    )


def running_template_counts(stream_df: DataFrame) -> DataFrame:
    """Streaming DataFrame (source, template_id, ...) → running counters.

    Use in a streaming query with outputMode("update"); state is persisted in
    the query's checkpoint.
    """
    return (
        stream_df.select("source", "template_id")
        .groupBy("source")
        .applyInPandasWithState(
            _update_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
