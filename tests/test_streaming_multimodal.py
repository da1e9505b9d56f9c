"""Structured Streaming counters (§2.9) + multimodal binary plumbing."""

import shutil

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def test_stream_windowed_counters_matches_batch(spark, events_dir):
    from crawler_pyspider_spark.streaming import stream_windowed_counters

    got = stream_windowed_counters(spark, events_dir, query_name="t_wc")
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("win_start"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    g = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert g == b and len(g) > 0


def test_stream_running_counts_matches_batch(spark, events_dir):
    from crawler_pyspider_spark.streaming import stream_running_counts

    got = stream_running_counts(spark, events_dir, query_name="t_rc")
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_media_features_deterministic_and_partition_invariant(spark):
    from crawler_pyspider_spark.functions.multimodal import docs_as_media, media_features

    media = docs_as_media(spark, SF_DIR)
    a = media_features(media.coalesce(1)).collect()
    b = media_features(media.repartition(8)).collect()
    norm = lambda rows: sorted((r["media_id"], r["n_bytes"], tuple(r["features"])) for r in rows)  # noqa: E731
    assert norm(a) == norm(b) and len(a) > 0
    # n_bytes really is the payload length
    lens = {r["media_id"]: r["n_bytes"] for r in a}
    for r in media.select("media_id", F.length("data").alias("n")).collect():
        assert lens[r["media_id"]] == r["n"]


def test_decode_image_is_a_stub():
    from crawler_pyspider_spark.functions import multimodal

    if multimodal._HAS_PIL:
        pytest.skip("PIL present; stub not applicable")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_frame_offsets_monotone(spark):
    from crawler_pyspider_spark.functions.multimodal import docs_as_media, frame_offsets

    rows = frame_offsets(docs_as_media(spark, SF_DIR), k=4).collect()
    for r in rows:
        offs = r["offsets"]
        assert len(offs) == 4 and offs[0] == 0
        assert offs == sorted(offs) and all(o < r["n_bytes"] for o in offs)
