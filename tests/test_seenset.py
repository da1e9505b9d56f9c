"""Partitioned bloom seen-set (operators/seenset.py) — the 10^10-scale
membership tier replacing the reference's taskdb point lookups
(database/sqlite/taskdb.py:72-85) + queue-membership dict
(task_queue.py:281-286)."""

import pytest
from pyspark.sql import functions as F

from crawler_pyspider_spark.operators import seenset

N_SHARDS, BITS, K = 8, 1 << 14, 5


def urls_df(spark, ids):
    return spark.createDataFrame(
        [(f"http://h{i % 5}.test/p/{i}",) for i in ids], "taskid string"
    )


def probe(spark, urls, shards):
    combined = seenset.probe_combined(
        urls, shards, n_shards=N_SHARDS, bits=BITS, k=K
    ).cache()
    flagged, new_shards = seenset.split(combined)
    f = {r["taskid"]: r["seen"] for r in flagged.collect()}
    s = new_shards.cache()
    s.count()
    combined.unpersist()
    return f, s


def test_first_batch_unseen_then_all_seen(spark):
    shards = seenset.empty_shards(spark, N_SHARDS, BITS)
    f1, shards = probe(spark, urls_df(spark, range(100)), shards)
    assert all(v is False for v in f1.values()) and len(f1) == 100
    f2, shards = probe(spark, urls_df(spark, range(100)), shards)
    assert all(v is True for v in f2.values())
    # disjoint batch: novel again (low fill => no false positives expected
    # at this sizing; a false positive would only cost an extra join probe)
    f3, _ = probe(spark, urls_df(spark, range(1000, 1100)), shards)
    assert sum(v for v in f3.values()) <= 2


def test_intra_batch_duplicates_seen_after_first(spark):
    shards = seenset.empty_shards(spark, N_SHARDS, BITS)
    dup = urls_df(spark, [1, 2, 1, 2, 3])
    combined = seenset.probe_combined(dup, shards, n_shards=N_SHARDS, bits=BITS, k=K)
    flagged, _ = seenset.split(combined)
    rows = flagged.groupBy("taskid").agg(
        F.count("*").alias("n"), F.sum(F.col("seen").cast("int")).alias("n_seen")
    ).collect()
    by_key = {r["taskid"]: (r["n"], r["n_seen"]) for r in rows}
    for (n, n_seen) in by_key.values():
        assert n_seen == n - 1  # exactly one unseen occurrence per key


def test_shard_rows_complete_and_counters(spark):
    shards = seenset.empty_shards(spark, N_SHARDS, BITS)
    _, new_shards = probe(spark, urls_df(spark, range(50)), shards)
    rows = new_shards.collect()
    assert sorted(r["shard"] for r in rows) == list(range(N_SHARDS))
    assert sum(r["n_items"] for r in rows) == 50
    assert all(len(r["bitmap"]) == BITS // 8 for r in rows)


def test_partition_invariance(spark):
    """Same membership verdicts regardless of input partitioning."""
    shards = seenset.empty_shards(spark, N_SHARDS, BITS)
    base = urls_df(spark, range(200))
    f1, _ = probe(spark, base.coalesce(1), shards)
    f2, _ = probe(spark, base.repartition(16), shards)
    assert f1 == f2


def test_engine_bloom_matches_exact(spark, small_world, tmp_path):
    """A bloom-filtered crawl reaches the same frontier as the exact
    engine (no false positives at this fill; FPs would only re-route
    rows through the exact join, never change membership)."""
    from crawler_pyspider_spark.engine import CrawlEngine

    states = {}
    for mode in ("exact", "bloom"):
        eng = CrawlEngine(
            spark,
            small_world["pages"],
            small_world["robots"],
            small_world["politeness"],
            str(tmp_path / f"wh_{mode}"),
            loop_limit=100000,
            seen_filter=mode,
        )
        eng.seed(small_world["seeds"])
        eng.run(3)
        states[mode] = sorted(
            (r["taskid"], r["status"], r["retried"], r["url"])
            for r in eng.frontier.collect()
        )
    assert states["exact"] == states["bloom"]
    assert len(states["exact"]) > 0


def test_engine_bloom_resume(spark, small_world, tmp_path):
    """Kill/resume with the bloom tier: shards restore from the snapshot
    and the resumed run equals the uninterrupted one."""
    from crawler_pyspider_spark.engine import CrawlEngine

    wh_a, wh_b = str(tmp_path / "a"), str(tmp_path / "b")
    kw = dict(loop_limit=100000, seen_filter="bloom")
    full = CrawlEngine(
        spark, small_world["pages"], small_world["robots"],
        small_world["politeness"], wh_a, **kw,
    )
    full.seed(small_world["seeds"])
    full.run(3)

    part = CrawlEngine(
        spark, small_world["pages"], small_world["robots"],
        small_world["politeness"], wh_b, **kw,
    )
    part.seed(small_world["seeds"])
    part.run(2)
    resumed = CrawlEngine.resume(
        spark, small_world["pages"], small_world["robots"],
        small_world["politeness"], wh_b, **kw,
    )
    assert resumed.seen_shards is not None
    resumed.run(1)

    key = lambda eng: sorted(  # noqa: E731
        (r["taskid"], r["status"], r["retried"], r["exetime"])
        for r in eng.frontier.collect()
    )
    assert key(full) == key(resumed)
