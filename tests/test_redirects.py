"""Redirect semantics in the pages-mode engine (S6; tornado_fetcher.py:
371-427 manual follow_redirects + e2e cases tests/test_fetcher_processor.
py:174+): chains resolve inside the fetch stage, the task's identity
stays keyed on the ORIGINAL url, and the result/parse side sees the
FINAL url."""

from pyspark.sql import functions as F

from crawler_pyspider_spark.engine import CrawlEngine
from crawler_pyspider_spark.operators.redirects import resolve_redirects
from crawler_pyspider_spark.sources import synth


def test_resolve_redirects_chain_and_budget(spark):
    batch = spark.createDataFrame(
        [("t1", "http://x.test/a"), ("t2", "http://x.test/z")],
        "taskid string, url string",
    )
    # a -> b -> c (2 hops); z settles immediately
    edges = spark.createDataFrame(
        [("http://x.test/a", "http://x.test/b"),
         ("http://x.test/b", "http://x.test/c")],
        "src_url string, location string",
    )
    got = {r["taskid"]: r for r in resolve_redirects(batch, edges, 5).collect()}
    assert got["t1"]["url"] == "http://x.test/c"
    assert got["t1"]["orig_url"] == "http://x.test/a"
    assert got["t1"]["_redirects"] == 2
    assert got["t2"]["url"] == "http://x.test/z" and got["t2"]["_redirects"] == 0
    # hop budget: max_hops=1 leaves t1 parked on the intermediate hop
    got1 = {r["taskid"]: r for r in resolve_redirects(batch, edges, 1).collect()}
    assert got1["t1"]["url"] == "http://x.test/b" and got1["t1"]["_redirects"] == 1


def test_engine_follows_redirects(spark, tmp_path):
    pages = synth.gen_pages(
        spark, n_pages=120, n_hosts=8, show=3, redirect_every=4
    ).cache()
    pages.count()
    eng = CrawlEngine(
        spark,
        pages,
        synth.gen_robots(spark, 8),
        synth.gen_politeness(spark, 8, rate=1000.0, burst=10000.0),
        str(tmp_path / "wh"),
        loop_limit=100000,
    )
    eng.seed(synth.gen_seeds(spark, pages, 40))
    m = eng.run_epoch()
    assert m["redirected"] > 0  # the world has ~1/4 redirect pages
    assert m["fetched_ok"] > 0

    # results never carry a 301 url — the chain resolved to the final
    # page before parse (response.url semantics)
    res = eng.results_df()
    rd_urls = pages.filter(F.col("status_code") == 301).select("url")
    assert res.join(rd_urls, "url", "inner").count() == 0

    # identity: the frontier folds status onto the ORIGINAL url's
    # taskid — a seeded redirecting url must be folded (SUCCESS/FAILED),
    # not still pending, and no frontier row exists for its target
    seeded_rd = (
        eng.frontier.join(rd_urls, "url", "left_semi")
        .select("status").distinct().collect()
    )
    assert seeded_rd, "some seeds should have been redirect pages"
    assert all(r["status"] != "ACTIVE" for r in seeded_rd)
