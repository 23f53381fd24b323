"""GA/PA/purity metrics vs the reference's worked example
(benchmark/baseline/METRICS_FORMULAS.md:355-438)."""

import pytest

from log_parser_cli_spark.eval.metrics import accuracy_metrics


@pytest.fixture(scope="module")
def worked_example(spark):
    rows = [("A", "1"), ("A", "1"), ("A", "2"), ("B", "3"), ("B", "3")]
    return spark.createDataFrame(rows, "gt_id string, pred_id string")


def test_worked_example_values(worked_example):
    m = accuracy_metrics(worked_example)
    assert m["GA"] == pytest.approx(2 / 3, abs=1e-9)
    assert m["GA_precision"] == pytest.approx(1.0)
    assert m["GA_recall"] == pytest.approx(0.5)
    assert m["PA"] == pytest.approx(0.4)
    assert m["predPure"] == pytest.approx(1.0)
    assert m["GA_friendly"] == pytest.approx(1.0)
    assert m["pureCoverage"] == pytest.approx(1.0)


def test_perfect_prediction(spark):
    rows = [("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"), ("C", "z")]
    m = accuracy_metrics(spark.createDataFrame(rows, "gt_id string, pred_id string"))
    assert m["GA"] == pytest.approx(1.0)
    assert m["PA"] == pytest.approx(1.0)
    assert m["gtPure"] == pytest.approx(1.0)


def test_labels_fixture_metrics(spark, fixture_dir):
    """The deterministic perturbation fixture: oversplit stays pure,
    merged clusters hurt predPure and PA."""
    import os

    labels = spark.read.parquet(os.path.join(fixture_dir, "labels.parquet"))
    m = accuracy_metrics(labels)
    assert 0 < m["GA"] < 1
    assert m["predPure"] < 1.0  # hdfs#merged is impure
    assert m["GA_friendly"] > m["GA"]  # pure oversplits get collapsed back


def test_macro_metrics():
    from log_parser_cli_spark.eval.metrics import macro_metrics

    per_ds = {
        "apache": {"GA": 1.0, "PA": 0.8},
        "hdfs": {"GA": 0.5, "PA": 0.4},
    }
    m = macro_metrics(per_ds)
    assert m == {"GA": 0.75, "PA": 0.6000000000000001}
    assert macro_metrics({}) == {}
