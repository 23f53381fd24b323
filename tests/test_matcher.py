"""Regex first-match-wins matcher (J2) vs the pure-Python oracle and GT."""

import os
from collections import Counter

import pyspark.sql.functions as F

from log_parser_cli_spark.operators.matcher import match_templates
from log_parser_cli_spark.operators.parse import parse_stage
from log_parser_cli_spark.oracle import load_fixture_table, oracle_counts, oracle_match
from log_parser_cli_spark.plans.pipeline import load_dims


def _parsed(spark, fixture_dir):
    vocab_rows, source_heads, _ = load_dims(spark, fixture_dir)
    seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
    return parse_stage(spark, seq, vocab_rows, source_heads)


def test_matcher_agrees_with_oracle_and_ground_truth(spark, fixture_dir):
    templates = load_fixture_table(fixture_dir, "templates")
    parsed = _parsed(spark, fixture_dir)
    matched = match_templates(spark, parsed, templates).cache()

    # 1) counts agree with the single-process oracle
    o_matches = oracle_match(fixture_dir)
    o_counts = oracle_counts(o_matches, load_fixture_table(fixture_dir, "sequences"))
    mine = Counter()
    for r in matched.groupBy("source", "template_id", "head_matched").count().collect():
        key = r.template_id if r.template_id else ("__UNPARSED__" if not r.head_matched else "__UNMATCHED__")
        mine[(r.source, key)] += r["count"]
    assert mine == o_counts

    # 2) matched template ids equal the generator's ground-truth event ids
    gt = spark.read.parquet(os.path.join(fixture_dir, "ground_truth.parquet"))
    j = matched.select("doc_id", "template_id").join(gt.select("doc_id", "event_id"), "doc_id")
    bad = j.filter(
        F.coalesce("template_id", F.lit("__UNPARSED__")) != F.col("event_id")
    )
    assert bad.count() == 0, bad.collect()[:5]
    matched.unpersist()


def test_matcher_variable_values_match_ground_truth(spark, fixture_dir):
    templates = load_fixture_table(fixture_dir, "templates")
    parsed = _parsed(spark, fixture_dir)
    matched = match_templates(spark, parsed, templates)
    mine = matched.filter(F.col("template_id").isNotNull()).select(
        "doc_id",
        F.array_join(
            F.expr("transform(sequence(1, size(variables)), i -> variables[concat('v', i)])"),
            "|",
        ).alias("my_vars"),
    )
    gt = spark.read.parquet(os.path.join(fixture_dir, "ground_truth.parquet"))
    j = mine.join(gt.select("doc_id", "var_concat"), "doc_id")
    bad = j.filter(F.coalesce("my_vars", F.lit("")) != F.col("var_concat"))
    assert bad.count() == 0, bad.collect()[:5]


def test_first_match_wins_precedence(spark):
    """Two overlapping templates: the earlier created_at must win (O1)."""
    templates = [
        {
            "template_id": "t#1",
            "source": "s",
            "pattern": r"^item (?P<v1>[A-Za-z0-9_/-]+) ok$",
            "created_at": 1,
        },
        {
            "template_id": "t#2",
            "source": "s",
            # also matches every line t#1 matches
            "pattern": r"^item (?P<v1>[^\r\n]*) ok$",
            "created_at": 2,
        },
    ]
    df = spark.createDataFrame(
        [("d1", "s", "item 42 ok"), ("d2", "s", "item a b ok")],
        "doc_id string, source string, content string",
    )
    got = {
        r.doc_id: r.template_id
        for r in match_templates(spark, df, templates).collect()
    }
    # d1 matches both → t#1 wins by precedence; d2 only matches the broad one
    assert got == {"d1": "t#1", "d2": "t#2"}

    # flipping created_at flips the winner
    templates[0]["created_at"], templates[1]["created_at"] = 2, 1
    got2 = {
        r.doc_id: r.template_id
        for r in match_templates(spark, df, templates, version=1).collect()
    }
    assert got2["d1"] == "t#2"


def test_full_line_anchoring(spark):
    """A prefix match is NOT a match (P8: match[0] === line)."""
    templates = [
        {"template_id": "t#1", "source": "s", "pattern": r"^ab (?P<v1>\d+)", "created_at": 1}
    ]
    df = spark.createDataFrame(
        [("d1", "s", "ab 12"), ("d2", "s", "ab 12 trailing")],
        "doc_id string, source string, content string",
    )
    got = {r.doc_id: r.template_id for r in match_templates(spark, df, templates).collect()}
    assert got == {"d1": "t#1", "d2": None}


def test_py_fallback_backtracks_into_end_anchor(spark):
    """RE2-incompatible patterns (backrefs) run on the Python engine; the
    full-line check must let backtracking pick a later alternative instead of
    rejecting after the first unanchored match (ADVICE: rx.fullmatch, not
    match()+end-length)."""
    from log_parser_cli_spark.operators.matcher import _compile_one

    # backreference forces the py engine; alt 1 matches a PREFIX of the line,
    # alt 2 matches the whole line — only fullmatch backtracks into alt 2
    pattern = r"(?P<a>x)(?P=a)|(?P<b>x)(?P=b)y"
    assert _compile_one("t#1", pattern).mode == "py"
    templates = [{"template_id": "t#1", "source": "s", "pattern": pattern, "created_at": 1}]
    df = spark.createDataFrame(
        [("d1", "s", "xxy"), ("d2", "s", "xx"), ("d3", "s", "xxz")],
        "doc_id string, source string, content string",
    )
    got = {r.doc_id: r.template_id for r in match_templates(spark, df, templates).collect()}
    assert got == {"d1": "t#1", "d2": "t#1", "d3": None}
