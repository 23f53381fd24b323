"""Driver-contract smoke: entry() runs, queries() and oracle_sql() align."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 20
    # every oracle refers to an existing query
    assert set(oracles) <= set(qs)
    # every query is oracle-checked (ann_ivf gained a full SQL twin once
    # centroids became deterministic literals)
    assert set(qs) == set(oracles)
    assert len(qs) >= 25


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"source", "template_star", "n_sequences"} <= set(df.columns)
    assert sum(r.n_sequences for r in rows) > 0
