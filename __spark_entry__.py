"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship parse→enrich→route→aggregate pipeline at sf0.001.
``queries``/``oracle_sql``: one pair per implemented operator family from
SURVEY.md §2 plus the training-data extras; implementations live in
log_parser_cli_spark/entry_impl.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-sink template counts from the full pipeline on the
    sf0.001 token fixtures (driver checks rows > 0 and stable schema)."""
    from log_parser_cli_spark.entry_impl import q_pipeline_sink_counts

    return q_pipeline_sink_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from log_parser_cli_spark.entry_impl import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from log_parser_cli_spark.entry_impl import build_oracle_sql

    return build_oracle_sql()
