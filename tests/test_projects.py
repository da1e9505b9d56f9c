"""Projectdb dim gating (S5/F2) + per-project buckets + _on_get_info.

Reference behaviours: scheduler.py:120-125 (_load_projects),
207-247 (_update_projects + _on_get_info handshake), 298-316
(task_verify rejects unknown/non-active projects), 506-536 (per-project
rate/burst select limiting), projectdb.py:14-22 (status model, defaults);
ported from tests/test_scheduler.py:166-199 (test_10_new_task_ignore,
test_20_new_project with TODO status).
"""

from pyspark.sql import functions as F

from crawler_pyspider_spark.engine import CrawlEngine


def mk(spark, small_world, wh, **kw):
    kw.setdefault("loop_limit", 100000)
    return CrawlEngine(
        spark,
        small_world["pages"],
        small_world["robots"],
        small_world["politeness"],
        wh,
        **kw,
    )


def _urls(small_world, n, host="host1.test"):
    return [
        r.url
        for r in small_world["pages"]
        .filter(F.col("url").startswith(f"http://{host}/"))
        .select("url").orderBy("url").limit(n).collect()
    ]


def test_unknown_project_task_ignored(spark, small_world, tmp_path):
    """test_10_new_task_ignore: tasks for a project not in projectdb
    never enter the queue."""
    eng = mk(
        spark, small_world, str(tmp_path / "wh"),
        projects={"bench": {"status": "RUNNING"}},
    )
    urls = _urls(small_world, 2)
    eng.seed(
        spark.createDataFrame(
            [(urls[0], "bench"), (urls[1], "ghost")], "url string, project string"
        )
    )
    eng.run_epoch()
    assert eng.frontier.filter(F.col("project") == "ghost").count() == 0
    assert eng.frontier.filter(F.col("project") == "bench").count() >= 1


def test_stopped_project_pauses_selection(spark, small_world, tmp_path):
    """test_20_new_project: a non-RUNNING/DEBUG project's queued tasks
    are not selected; flipping back to RUNNING resumes them."""
    eng = mk(
        spark, small_world, str(tmp_path / "wh"),
        projects={"bench": {"status": "RUNNING", "rate": 1000.0, "burst": 10000.0}},
        loop_limit=2,
    )
    eng.seed(spark.createDataFrame([(u,) for u in _urls(small_world, 4)], "url string"))
    m0 = eng.run_epoch()
    assert m0["selected"] == 2  # loop_limit caps; 2 tasks stay ACTIVE
    eng.update_project("bench", status="STOP")
    m1 = eng.run_epoch()
    assert "bench" in m1["paused_projects"] and m1["selected"] == 0
    eng.update_project("bench", status="RUNNING")
    m2 = eng.run_epoch()
    assert m2["selected"] >= 1


def test_project_rate_burst_caps_selects(spark, small_world, tmp_path):
    """scheduler.py:506-536: the project bucket (rate/burst from
    projectdb) limits selects per epoch independently of host
    politeness."""
    eng = mk(
        spark, small_world, str(tmp_path / "wh"),
        projects={"bench": {"status": "RUNNING", "rate": 0.0, "burst": 3.0}},
    )
    eng.seed(
        spark.createDataFrame(
            [(u,) for u in _urls(small_world, 8, "host1.test")], "url string"
        )
    )
    m0 = eng.run_epoch()
    assert m0["selected"] == 3  # full bucket = burst
    m1 = eng.run_epoch()
    assert m1["selected"] == 0  # rate 0: bucket never refills


def test_on_get_info_handshake(spark, small_world, tmp_path):
    eng = mk(
        spark, small_world, str(tmp_path / "wh"),
        projects={"bench": {"status": "RUNNING", "rate": 1000.0, "burst": 10000.0}},
    )
    m0 = eng.run_epoch()
    # the handshake control task fetched via its data: URI...
    assert m0["ingested"] == 1 and m0["fetched_ok"] == 1
    # ...updated the driver-side project info...
    assert eng._projects["bench"]["info"] == {"min_tick": 0}
    # ...and left no frontier row (ephemeral, like @not_send_status)
    assert eng.frontier.filter(F.col("callback") == "_on_get_info").count() == 0
    m1 = eng.run_epoch()
    assert m1["ingested"] == 0  # sent once
    eng.update_project("bench", rate=2.0)  # projectdb update re-arms it
    m2 = eng.run_epoch()
    assert m2["ingested"] == 1


def test_project_state_survives_resume(spark, small_world, tmp_path):
    wh = str(tmp_path / "wh")
    kw = dict(
        projects={"bench": {"status": "RUNNING", "rate": 1000.0, "burst": 10000.0}},
        loop_limit=2,
    )
    eng = mk(spark, small_world, wh, **kw)
    eng.seed(spark.createDataFrame([(u,) for u in _urls(small_world, 4)], "url string"))
    eng.run_epoch()
    eng.update_project("bench", status="STOP")
    eng.run_epoch()  # commits engine_state with STOP
    resumed = CrawlEngine.resume(
        spark,
        small_world["pages"],
        small_world["robots"],
        small_world["politeness"],
        wh,
        loop_limit=2,
    )
    assert resumed._projects["bench"]["status"] == "STOP"
    m = resumed.run_epoch()
    assert "bench" in m["paused_projects"] and m["selected"] == 0
