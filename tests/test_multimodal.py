"""Multimodal binary-column plumbing (decode stubbed; Spark shape real)."""

import pytest

from log_parser_cli_spark.extras.multimodal import (
    extract_features,
    frame_sample_plan,
    make_fake_assets,
)


def test_feature_extraction_shapes(spark):
    assets = make_fake_assets(spark, n=32)
    feats = extract_features(spark, assets, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 32
    assert "payload" not in feats.columns  # binary column pruned from output
    assert all(r.n_bytes > 0 and len(r.phash) == 16 and r.decoded for r in rows)
    # deterministic across runs
    again = {r.asset_id: r.phash for r in extract_features(spark, assets, True).collect()}
    assert again == {r.asset_id: r.phash for r in rows}


def test_real_decode_is_stubbed(spark):
    assets = make_fake_assets(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        extract_features(spark, assets, fake_decode=False).collect()


def test_frame_sample_plan_no_payload_scan(spark):
    assets = make_fake_assets(spark, n=16)
    plan_df = frame_sample_plan(assets, every_ms=500)
    rows = plan_df.collect()
    videos = [r for r in assets.collect() if r.mime.startswith("video/")]
    expected = sum((r.duration_ms + 499) // 500 for r in videos)
    assert len(rows) == expected
    # the physical plan must not read the payload column
    assert "payload" not in plan_df.columns
