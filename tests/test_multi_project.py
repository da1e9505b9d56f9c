"""Per-project handler dispatch (§2.10 / J5; processor/processor.py:
110-121 + processor/project_module.py — every task routes to its
project's OWN script module, and a projectdb update hot-reloads it).

Ported semantics: tests/test_scheduler.py (multi-project operation
throughout) + tests/test_processor.py (per-project callback bodies).
"""

import json

from pyspark.sql import functions as F

from crawler_pyspider_spark.engine import Callback, CrawlEngine, Handler


def _mk(spark, small_world, wh, **kw):
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


def _projects(*names):
    return {
        n: {"status": "RUNNING", "rate": 1000.0, "burst": 10000.0} for n in names
    }


def test_same_callback_name_different_spec_per_project(spark, small_world, tmp_path):
    """'index_page' means FOLLOW LINKS in project alpha but EMIT RESULT
    in project beta — dispatch must key on (project, callback), not the
    callback name (processor.py:110-121)."""
    handlers = {
        "alpha": Handler(callbacks={
            "index_page": Callback(extract_links=True, link_callback="detail"),
            "detail": Callback(emit_result=True),
        }),
        "beta": Handler(callbacks={
            "index_page": Callback(emit_result=True),
        }),
    }
    eng = _mk(
        spark, small_world, str(tmp_path / "wh"),
        project="alpha",
        handlers=handlers,
        projects=_projects("alpha", "beta"),
    )
    urls = _urls(small_world, 2)
    eng.seed(spark.createDataFrame(
        [(u, p) for u in urls for p in ("alpha", "beta")],
        "url string, project string",
    ))
    eng.run_epoch()

    # beta's index_page emitted results in epoch 0; alpha's did not
    res = eng.results_df()
    assert res is not None
    by_proj = {r["project"]: r["n"] for r in
               res.groupBy("project").agg(F.count("*").alias("n")).collect()}
    assert by_proj.get("beta", 0) == 2
    assert "alpha" not in by_proj

    # alpha's index_page emitted follows, and they INHERIT project=alpha
    # with alpha's link_callback; beta emitted none
    eng.run_epoch()
    fr = eng.frontier.filter(F.col("callback") == "detail")
    projs = {r["project"] for r in fr.select("project").distinct().collect()}
    assert projs == {"alpha"}
    assert fr.count() > 0
    assert eng.frontier.filter(
        (F.col("project") == "beta") & (F.col("callback") == "detail")
    ).count() == 0


def test_per_project_custom_parse(spark, small_world, tmp_path):
    """Two projects share a callback name but run DIFFERENT parse
    bodies (project_module.py: each project's script defines its own
    index_page)."""

    def parse_a(url, html, save):
        return ("A:" + url, [], json.dumps({"engine": "a"}))

    def parse_b(url, html, save):
        return ("B:" + url, [], json.dumps({"engine": "b"}))

    handlers = {
        "pa": Handler(callbacks={
            "index_page": Callback(emit_result=True, parse=parse_a),
        }),
        "pb": Handler(callbacks={
            "index_page": Callback(emit_result=True, parse=parse_b),
        }),
    }
    eng = _mk(
        spark, small_world, str(tmp_path / "wh"),
        project="pa",
        handlers=handlers,
        projects=_projects("pa", "pb"),
    )
    urls = _urls(small_world, 2)
    eng.seed(spark.createDataFrame(
        [(u, p) for u in urls for p in ("pa", "pb")],
        "url string, project string",
    ))
    eng.run_epoch()
    rows = eng.results_df().select("project", "result").collect()
    assert len(rows) == 4
    for r in rows:
        payload = json.loads(r["result"])
        assert payload["engine"] == ("a" if r["project"] == "pa" else "b")


def test_handler_hot_reload_rearms_get_info(spark, small_world, tmp_path):
    """update_project(handler=...) swaps the project's Handler
    (md5sum/updatetime script reload, project_module.py:52-87): new
    epochs dispatch through the new spec and the _on_get_info
    handshake re-reads its @every info."""
    handlers = {
        "alpha": Handler(callbacks={
            "index_page": Callback(emit_result=True),
        }),
    }
    eng = _mk(
        spark, small_world, str(tmp_path / "wh"),
        project="alpha",
        handlers=handlers,
        projects=_projects("alpha"),
    )
    urls = _urls(small_world, 2)
    eng.seed(spark.createDataFrame([(u, "alpha") for u in urls],
                                   "url string, project string"))
    eng.run_epoch()
    assert eng._projects["alpha"]["info"] == {"min_tick": 0}
    n0 = eng.results_df().count()
    assert n0 == 2

    # reload: index_page stops emitting results, gains an @every cron
    eng.update_project("alpha", handler=Handler(callbacks={
        "index_page": Callback(emit_result=False),
        "refresh": Callback(every=1),
    }))
    eng.seed(spark.createDataFrame([(u, "alpha") for u in _urls(small_world, 4)[2:]],
                                   "url string, project string"))
    eng.run_epoch()
    eng.run_epoch()
    # new spec: no new results beyond the first epoch's two
    assert eng.results_df().count() == n0
    # handshake re-armed and read the NEW handler's @every info
    assert eng._projects["alpha"]["info"] == {"min_tick": 1}


def test_legacy_single_handler_promotes_on_reload(spark, small_world, tmp_path):
    """A legacy single-handler engine that gains a second project's
    handler mid-run switches to (project, callback) dispatch without
    losing cron state."""
    eng = _mk(
        spark, small_world, str(tmp_path / "wh"),
        handler=Handler(callbacks={
            "index_page": Callback(emit_result=True, every=1),
        }),
        project="bench",
        projects=_projects("bench"),
    )
    eng.seed(spark.createDataFrame([(u,) for u in _urls(small_world, 2)],
                                   "url string"))
    eng.run_epoch()  # fires the @every once; records _cron_last["index_page"]
    assert eng._cron_last.get("index_page") is not None
    last = eng._cron_last["index_page"]
    eng.update_project("extra", handler=Handler(callbacks={
        "index_page": Callback(extract_links=True, link_callback="index_page"),
    }))
    assert eng._multi
    # migrated key: the legacy project's cron state survives the promote
    assert eng._cron_last["bench\x1findex_page"] == last
    eng.run_epoch()  # multi-mode epoch runs clean over the existing rows
