"""Engine control semantics: cron (W7), on_finished (W8), send_message
(§2.10), data-URI fetch (S7), and the failure-streak pause machine (A10).
Reference behaviours: scheduler.py:420-450, 541-562, 52-103;
base_handler.py:69-98, 433-439; tornado_fetcher.py:191-214."""

from urllib.parse import quote

from pyspark.sql import functions as F

from crawler_pyspider_spark.engine import Callback, CrawlEngine, Handler


def mk_engine(spark, small_world, wh, handler=None, **kw):
    eng = CrawlEngine(
        spark,
        small_world["pages"],
        small_world["robots"],
        small_world["politeness"],
        wh,
        loop_limit=100000,
        **({"handler": handler} if handler else {}),
        **kw,
    )
    return eng


def test_cron_fires_on_schedule_and_crawls_seeds(spark, small_world, tmp_path):
    seed_url = small_world["pages"].select("url").orderBy("url").first()["url"]
    handler = Handler(
        callbacks={
            "on_start": Callback(every=2, cron_seeds=(seed_url,), link_callback="index_page"),
            "index_page": Callback(extract_links=True, link_callback="index_page",
                                   emit_result=True),
        }
    )
    eng = mk_engine(spark, small_world, str(tmp_path / "wh"), handler)
    ms = eng.run(4)
    # tick = epoch+1 (interval 1s): fires at epochs 1 and 3
    assert [m["ingested"] > 0 for m in ms] == [False, True, True, True]
    # the cron control task itself fetched via its data: URI (no 404s)
    assert all(m["fetch_missing"] == 0 for m in ms)
    res = eng.results_df()
    assert res is not None and res.filter(F.col("url") == seed_url).count() >= 1


def test_send_message_roundtrip(spark, small_world, tmp_path):
    handler = Handler(
        callbacks={
            "index_page": Callback(extract_links=True, link_callback="index_page"),
            "_on_message": Callback(emit_result=True),
        }
    )
    eng = mk_engine(spark, small_world, str(tmp_path / "wh"), handler)
    eng.send_message("bench", "hello frontier")
    ms = eng.run(2)
    assert ms[0]["ingested"] == 1 and ms[0]["selected"] == 1
    assert ms[0]["fetched_ok"] == 1  # data: URI answered without pages
    res = eng.results_df()
    assert res.filter(F.col("url") == "data:," + quote("hello frontier")).count() == 1


def test_on_finished_emitted_once_after_drain(spark, small_world, tmp_path):
    handler = Handler(
        callbacks={
            "index_page": Callback(extract_links=True, link_callback="index_page"),
            "on_finished": Callback(emit_result=True),
        }
    )
    eng = mk_engine(spark, small_world, str(tmp_path / "wh"), handler)
    eng.seed(small_world["seeds"])
    flags = []
    for _ in range(12):
        m = eng.run_epoch()
        flags.append(m.get("on_finished", False))
        if m.get("on_finished"):
            break
    assert sum(flags) == 1  # fired exactly once
    # the lifecycle callback ran as a control task the epoch after
    m2 = eng.run_epoch()
    assert m2["selected"] == 1 and m2["fetched_ok"] == 1
    res = eng.results_df()
    assert res.filter(F.col("url").startswith("data:,on_finished")).count() == 1


def test_pause_after_failure_streak_and_unpause(spark, small_world, tmp_path):
    bad_seeds = spark.createDataFrame(
        [(f"http://host1.test/missing/{i}",) for i in range(5)], "url string"
    )
    eng = mk_engine(
        spark, small_world, str(tmp_path / "wh"), fail_pause_num=3, pause_epochs=2
    )
    eng.seed(bad_seeds)
    m0 = eng.run_epoch()
    assert m0["fetch_missing"] == 5 and m0["fetched_ok"] == 0
    assert eng._project_state["bench"]["streak"] == 5
    m1 = eng.run_epoch()
    assert m1["paused_projects"] == ["bench"]  # paused while streak holds
    m2 = eng.run_epoch()
    assert m2["paused_projects"] == ["bench"]
    m3 = eng.run_epoch()  # pause window (2 epochs) elapsed
    assert m3["paused_projects"] == []


def test_pause_state_survives_resume(spark, small_world, tmp_path):
    bad_seeds = spark.createDataFrame(
        [(f"http://host1.test/missing/{i}",) for i in range(5)], "url string"
    )
    wh = str(tmp_path / "wh")
    eng = mk_engine(spark, small_world, wh, fail_pause_num=3, pause_epochs=5)
    eng.seed(bad_seeds)
    eng.run(1)
    resumed = CrawlEngine.resume(
        spark,
        small_world["pages"],
        small_world["robots"],
        small_world["politeness"],
        wh,
        loop_limit=100000,
        fail_pause_num=3,
        pause_epochs=5,
    )
    assert resumed._project_state["bench"]["streak"] == 5
    m = resumed.run_epoch()
    assert m["paused_projects"] == ["bench"]
