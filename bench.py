"""Benchmark harness — prints ONE JSON line.

Headline metric: frontier throughput (URLs scheduled+deduped/sec) from
a multi-epoch crawl of the synthetic Common-Crawl-style world, plus
per-query wall seconds for the representative operator battery at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Scaling-efficiency evidence (N vs 4N cores) is produced by
``tools/scaling_bench.py`` and recorded in ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "tpch_pricing",
    "revenue_by_nation",
    "frontier_rank",
    "windowed_counters",
    "sessionize",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "token_count",
    "quality_score",
    "ann_cosine_topk",
    "crawl_reachability",
]


def time_query(fn, spark, sf_dir) -> float:
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    df.count()
    return time.monotonic() - t0


def crawl_bench(
    spark, n_pages: int, n_hosts: int, epochs: int = 3, body_kb: int = 20, show: int = 20
) -> dict:
    from crawler_pyspider_spark.engine import BENCH_HANDLER, CrawlEngine
    from crawler_pyspider_spark.sources import synth

    pages_full = synth.gen_pages(
        spark, n_pages=n_pages, n_hosts=n_hosts, show=show, body_kb=body_kb
    )
    # cache only what the fetch join reads; column pruning drops the
    # text-decode UDF entirely
    pages = pages_full.select("url", "html").cache()
    pages.count()  # materialize outside the timed window
    robots = synth.gen_robots(spark, n_hosts)
    politeness = synth.gen_politeness(spark, n_hosts, rate=1e6, burst=1e7)
    wh = tempfile.mkdtemp(prefix="bench_wh_")
    eng = CrawlEngine(
        spark, pages, robots, politeness, wh,
        handler=BENCH_HANDLER, loop_limit=10_000_000,
    )
    eng.seed(synth.gen_seeds(spark, pages, max(n_pages // 2, 100)))
    t0 = time.monotonic()
    ms = eng.run(epochs)
    elapsed = time.monotonic() - t0
    urls = sum(m["ingested"] + m["selected"] for m in ms)
    pages.unpersist()
    return {
        "elapsed_sec": elapsed,
        "urls_scheduled_deduped": urls,
        "throughput_urls_per_sec": urls / elapsed if elapsed else 0.0,
        "epoch_metrics": ms,
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from crawler_pyspider_spark.queries import QUERIES
    from crawler_pyspider_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        cores=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "4096"},
    )

    # crawl world sized by sf (sf0.1 -> 100k pages): large enough that
    # per-epoch dataflow work dominates fixed per-epoch job overhead
    n_pages = max(int(sf * 1_000_000), 2000)
    n_hosts = max(n_pages // 100, 16)

    t_suite0 = time.monotonic()
    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        qtimes[name] = round(time_query(QUERIES[name], spark, sf_dir), 3)

    crawl = crawl_bench(spark, n_pages, n_hosts)
    qtimes["crawl_3epochs"] = round(crawl["elapsed_sec"], 3)
    suite_sec = time.monotonic() - t_suite0

    out = {
        "metric": "frontier_throughput_urls_per_sec",
        "value": round(crawl["throughput_urls_per_sec"], 1),
        "unit": "urls/sec",
        "queries": qtimes,
        "sf": sf,
        "suite_seconds": round(suite_sec, 2),
        "crawl": {
            "n_pages": n_pages,
            "n_hosts": n_hosts,
            "urls_scheduled_deduped": crawl["urls_scheduled_deduped"],
            "elapsed_sec": round(crawl["elapsed_sec"], 2),
        },
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
