"""Multimodal plumbing tests: schema/batch shape of the stubbed decode,
deterministic fake features, byte-aware partitioning, frame-sample fanout,
and the NotImplementedError seam for real codecs."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_decode,
    extract_features,
    frame_sample_plan,
    media_repartition,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=60, seed=42).cache()


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media, dim=16)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 60
    for r in rows.values():
        assert len(r["feature"]) == 16
    # determinism: same payload -> same feature, twice
    again = {r["media_id"]: r for r in extract_features(media, dim=16).collect()}
    assert all(rows[k]["feature"] == again[k]["feature"] for k in rows)


def test_fake_decode_matches_row_wise(spark, media):
    row = media.where("media_id = 3").first()
    expected = _fake_decode(bytes(row["payload"]), FEATURE_DIM)
    got = extract_features(media.where("media_id = 3")).first()["feature"]
    assert np.allclose(expected, got, atol=1e-6)


def test_real_decoder_seam_raises(spark, media):
    with pytest.raises(Exception) as exc_info:
        extract_features(media.limit(2), decode_stub=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_fanout(spark, media):
    plan = frame_sample_plan(media, every_ms=1000)
    got = plan.groupBy("media_id").count().collect()
    vids = {r["media_id"]: r["duration_ms"] for r in media.where("kind = 'video'").collect()}
    assert {r["media_id"] for r in got} == set(vids)
    for r in got:
        dur = vids[r["media_id"]]
        assert r["count"] == max(dur - 1, 0) // 1000 + 1


def test_media_repartition_sample_path_is_byte_aware(spark, media):
    # in-memory frame -> no input files -> sampled-length sizing
    # (sample_frac=1.0 makes the estimate exact for the assertion)
    out = media_repartition(media, target_bytes=1 << 10, sample_frac=1.0)
    total = media.select(F.sum(F.length("payload"))).first()[0]
    import math

    assert out.rdd.getNumPartitions() == math.ceil(total / (1 << 10))


def test_media_repartition_file_sizing_reads_no_data(spark, media, tmp_path, monkeypatch):
    """File-backed sizing must come from filesystem metadata only — no
    sample, no payload scan (VERDICT.md 'What's wrong' #1)."""
    import glob
    import math
    import os

    from pyspark.sql import DataFrame

    p = str(tmp_path / "media_pq")
    media.write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)

    def _no_scan(self, *a, **k):
        raise AssertionError("sizing must not scan data rows")

    monkeypatch.setattr(DataFrame, "sample", _no_scan)
    out = media_repartition(df, target_bytes=1 << 12)
    disk = sum(os.path.getsize(f) for f in glob.glob(os.path.join(p, "*.parquet")))
    assert out.rdd.getNumPartitions() == math.ceil(disk / (1 << 12))
