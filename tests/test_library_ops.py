"""Library maintenance ops: upsert, capped store, orphan re-queue, conflicts,
report sinks (K2-K7, E2-E4, J3, A9)."""

import json
import os

import pyspark.sql.functions as F

from log_parser_cli_spark.plans.library_ops import (
    append_matches_capped,
    detect_conflicts,
    exclude_seen,
    merge_templates,
    requeue_orphans,
    write_conflict_report,
    write_failure_report,
    write_match_report,
)


def test_merge_templates_upsert(spark):
    existing = spark.createDataFrame(
        [("t#1", "old pattern"), ("t#2", "keep me")], "template_id string, pattern string"
    )
    updates = spark.createDataFrame(
        [("t#1", "new pattern"), ("t#3", "brand new")], "template_id string, pattern string"
    )
    got = {r.template_id: r.pattern for r in merge_templates(existing, updates).collect()}
    assert got == {"t#1": "new pattern", "t#2": "keep me", "t#3": "brand new"}


def test_append_matches_capped(spark):
    existing = spark.createDataFrame(
        [("s", i, f"line{i}") for i in range(10)], "source string, line_no long, content string"
    )
    new = spark.createDataFrame(
        [("s", i, f"line{i}") for i in range(8, 15)], "source string, line_no long, content string"
    )
    got = append_matches_capped(existing, new, cap=6)
    rows = sorted(r.line_no for r in got.collect())
    assert rows == [9, 10, 11, 12, 13, 14]  # newest 6, duplicates collapsed


def test_requeue_orphans(spark):
    matches = spark.createDataFrame(
        [("d1", "t#1", "a"), ("d2", "t#2", "b"), ("d3", "t#1", "c")],
        "doc_id string, template_id string, content string",
    )
    pending = spark.createDataFrame([("d9", "z")], "doc_id string, content string")
    kept, new_pending = requeue_orphans(matches, ["t#1"], pending)
    assert {r.doc_id for r in kept.collect()} == {"d2"}
    assert {r.doc_id for r in new_pending.collect()} == {"d9", "d1", "d3"}


def test_exclude_seen(spark):
    cands = spark.createDataFrame([("x",), ("y",), ("z",)], "content string")
    seen = spark.createDataFrame([("y",)], "content string")
    assert {r.content for r in exclude_seen(cands, seen).collect()} == {"x", "z"}


def test_detect_conflicts(spark):
    samples = spark.createDataFrame(
        [
            ("t#1", "served 12 blocks"),
            ("t#1", "served 99 blocks"),
            ("t#2", "error 5 raised"),
            ("t#3", "unrelated line"),
        ],
        "template_id string, content string",
    )
    # candidate (t#9) is overbroad: matches t#1's and t#2's samples
    conflicts = detect_conflicts(samples, "t#9", r"^(?P<v1>[a-z]+) (?P<v2>\d+) (?P<v3>[a-z]+)$")
    got = {r.template_id: r.n_conflicts for r in conflicts.collect()}
    assert got == {"t#1": 2, "t#2": 1}


def test_conflicts_ignore_own_samples(spark):
    samples = spark.createDataFrame(
        [("t#9", "served 12 blocks")], "template_id string, content string"
    )
    assert detect_conflicts(samples, "t#9", r"^served \d+ blocks$").count() == 0


def test_report_sinks(spark, tmp_path):
    matched = spark.createDataFrame(
        [("raw a", "t#1", "tpl <*>")], "raw_log string, template_id string, template_placeholder string"
    )
    write_match_report(matched, str(tmp_path / "matches"))
    back = spark.read.option("header", True).csv(str(tmp_path / "matches"))
    assert back.count() == 1 and back.columns == ["raw_log", "template_id", "template_placeholder"]

    conflicts = spark.createDataFrame(
        [("t#1", 2, ["a", "b"], "t#9")],
        "template_id string, n_conflicts long, sample_contents array<string>, candidate_template_id string",
    )
    path = write_conflict_report(conflicts, str(tmp_path))
    payload = json.load(open(path))
    assert payload["totalConflicts"] == 2 and len(payload["conflicts"]) == 1

    failures = spark.createDataFrame(
        [(3, "bad line", "parse", "head pattern did not match")],
        "line_index long, raw_log string, stage string, reason string",
    )
    write_failure_report(failures, str(tmp_path / "failures"))
    back = spark.read.json(str(tmp_path / "failures"))
    assert back.count() == 1 and back.first().stage == "parse"
