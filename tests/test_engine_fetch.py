"""F6 fetch-protocol semantics + §2.10 handler surface:

- non-200 gating + retry ladder       tornado_fetcher status path,
                                      tests/test_fetcher_processor.py:107-139
- @catch_status_code_error            base_handler.py:27-33
- conditional fetch / 304 keeps old   tornado_fetcher.py:273-291,
  content (callback skipped)          base_handler.py:173-174
- save payload crawl→callback→links   base_handler.py:222-225
- get_taskid override                 base_handler.py:340-342
- @not_send_status                    base_handler.py:36-47
- result upsert by (project, taskid)  result_worker.py:30-46
"""

from pyspark.sql import functions as F

from crawler_pyspider_spark.engine import Callback, CrawlEngine, Handler
from crawler_pyspider_spark.operators import frontier as FR
from crawler_pyspider_spark.sources import synth

RESULT_ONLY = Handler(callbacks={"index_page": Callback(emit_result=True)})
CATCH = Handler(
    callbacks={"index_page": Callback(emit_result=True, catch_status_code_error=True)}
)
# age=1s + auto_recrawl: every epoch (interval 5s) re-fetches the page
RECRAWL = Handler(
    callbacks={
        "index_page": Callback(emit_result=True, config={"age": 1, "auto_recrawl": True})
    }
)


def mk_engine(spark, pages, wh, handler, **kw):
    robots = synth.gen_robots(spark, 8)
    pol = synth.gen_politeness(spark, 8, rate=1000.0, burst=10000.0)
    return CrawlEngine(
        spark, pages, robots, pol, wh, handler=handler, loop_limit=100000, **kw
    )


def _urls(pages, status, n=3):
    """n urls with the given status code, robots-clean hosts only."""
    return [
        r.url
        for r in pages.filter(
            (F.col("status_code") == status)
            & ~F.col("url").rlike(r"//host[234]\.test/")
        )
        .select("url")
        .orderBy("url")
        .limit(n)
        .collect()
    ]


def _seed_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_non200_skips_callback_and_hits_retry_ladder(spark, tmp_path):
    pages = synth.gen_pages(spark, 120, 8, show=2, status_every=4).cache()
    bad = _urls(pages, 404) + _urls(pages, 500)
    good = _urls(pages, 200)
    assert bad and good
    eng = mk_engine(spark, pages, str(tmp_path / "wh"), RESULT_ONLY)
    eng.seed(_seed_df(spark, bad + good))
    m = eng.run_epoch()
    assert m["fetch_error"] == len(bad)
    assert m["fetched_ok"] == len(good)
    rows = {r.url: r for r in eng.frontier.collect()}
    for u in bad:  # fetch failed -> retry ladder (W5), not SUCCESS
        assert rows[u].status == FR.ACTIVE and rows[u].retried == 1
    for u in good:
        assert rows[u].status == FR.SUCCESS
    res = eng.results_df()
    assert res.filter(F.col("url").isin(bad)).count() == 0  # callback skipped
    assert res.filter(F.col("url").isin(good)).count() == len(good)
    pages.unpersist()


def test_catch_status_code_error_processes_non200(spark, tmp_path):
    pages = synth.gen_pages(spark, 120, 8, show=2, status_every=4).cache()
    bad = _urls(pages, 404)
    assert bad
    eng = mk_engine(spark, pages, str(tmp_path / "wh"), CATCH)
    eng.seed(_seed_df(spark, bad))
    m = eng.run_epoch()
    assert m["fetch_error"] == 0 and m["fetched_ok"] == len(bad)
    rows = {r.url: r for r in eng.frontier.collect()}
    assert all(rows[u].status == FR.SUCCESS for u in bad)
    # the callback DID run: results exist for the 404 pages
    assert eng.results_df().filter(F.col("url").isin(bad)).count() == len(bad)
    pages.unpersist()


def test_conditional_fetch_304_keeps_old_content(spark, tmp_path):
    pages = synth.gen_pages(spark, 40, 8, show=2).cache()
    url = _urls(pages, 200, 1)[0]
    eng = mk_engine(spark, pages, str(tmp_path / "wh"), RECRAWL, epoch_interval=5.0)
    eng.seed(_seed_df(spark, [url]))
    m0 = eng.run_epoch()
    assert m0["fetched_ok"] == 1 and m0["fetched_not_modified"] == 0
    m1 = eng.run_epoch()  # auto_recrawl re-fetch: etag unchanged -> 304
    assert m1["selected"] == 1
    assert m1["fetched_not_modified"] == 1 and m1["fetched_ok"] == 1
    # 304 keeps old content: callback skipped, still exactly one result
    assert eng.results_df(latest_only=False).count() == 1
    row = eng.frontier.filter(F.col("url") == url).collect()[0]
    assert row.status == FR.ACTIVE  # re-armed again (W6) — 304 is a success
    assert row.last_etag is not None
    pages.unpersist()


def test_result_upsert_on_content_change(spark, tmp_path):
    pages = synth.gen_pages(spark, 40, 8, show=2).cache()
    url = _urls(pages, 200, 1)[0]
    eng = mk_engine(spark, pages, str(tmp_path / "wh"), RECRAWL, epoch_interval=5.0)
    eng.seed(_seed_df(spark, [url]))
    eng.run_epoch()
    # content changed: new etags -> the refetch is a real 200
    eng.pages = synth.gen_pages(spark, 40, 8, show=2, etag_salt="v2").cache()
    m1 = eng.run_epoch()
    assert m1["fetched_not_modified"] == 0 and m1["fetched_ok"] == 1
    raw = eng.results_df(latest_only=False)
    assert raw.filter(F.col("url") == url).count() == 2  # append log
    up = eng.results_df()  # resultdb upsert view
    rows = up.filter(F.col("url") == url).collect()
    assert len(rows) == 1 and rows[0].updatetime == eng.now(1)
    pages.unpersist()


def test_save_payload_flows_to_follows_and_results(spark, tmp_path):
    handler = Handler(
        callbacks={
            "on_start": Callback(
                extract_links=True, link_callback="detail", forward_save=True
            ),
            "detail": Callback(emit_result=True),
        }
    )
    pages = synth.gen_pages(spark, 40, 8, show=2).cache()
    url = _urls(pages, 200, 1)[0]
    eng = mk_engine(spark, pages, str(tmp_path / "wh"), handler)
    eng.seed(
        spark.createDataFrame([(url, '{"k": 1}')], "url string, save string"),
        callback="on_start",
    )
    eng.run(2)
    det = eng.frontier.filter(F.col("callback") == "detail")
    assert det.count() > 0
    assert {r.save for r in det.select("save").collect()} == {'{"k": 1}'}
    res = eng.results_df()
    got = res.select("save").collect()
    assert got and {r.save for r in got} == {'{"k": 1}'}
    pages.unpersist()


def test_get_taskid_override_dedups_by_custom_key(spark, tmp_path):
    pages = synth.gen_pages(spark, 40, 4, show=2).cache()
    one_host = [
        r.url
        for r in pages.filter(F.col("url").startswith("http://host1.test/"))
        .select("url").limit(3).collect()
    ]
    assert len(one_host) >= 2
    eng = mk_engine(
        spark, pages, str(tmp_path / "wh"), RESULT_ONLY,
        taskid_fn=lambda df: F.concat(F.lit("host:"), F.col("host")),
    )
    eng.seed(_seed_df(spark, one_host))
    eng.run_epoch()
    # custom dedup key: all same-host urls collapse to ONE task
    assert eng.frontier.count() == 1
    assert eng.frontier.collect()[0].taskid == "host:host1.test"
    pages.unpersist()


def test_custom_parse_callback(spark, tmp_path):
    """J5 — arbitrary per-callback parse body (the handler dispatch of
    base_handler.py:161-219): a plain Python fn on the Callback runs as
    an Arrow-batched UDF instead of the built-in parser, choosing its
    own follows and emitting a custom result payload."""
    import json
    import re

    def my_parse(url, html, save):
        if html is None:
            return (None, [], None)
        text = bytes(html).decode("utf-8", "replace")
        links = re.findall(r"href='([^']+)'", text)
        absolute = [l for l in links if l.startswith("http")]
        return ("custom", absolute[:1], json.dumps({"n_links": len(links), "src": url}))

    handler = Handler(
        callbacks={
            "index_page": Callback(
                extract_links=True, link_callback="detail",
                emit_result=True, parse=my_parse,
            ),
            "detail": Callback(),
        }
    )
    pages = synth.gen_pages(spark, 40, 8, show=3).cache()
    # a 200 page outside robots-blocked hosts whose links are absolute
    # (synth writes relative hrefs only when page_id % 7 == 3)
    url = next(
        u for u in _urls(pages, 200, 10)
        if int(u.rsplit("/", 1)[1]) % 7 != 3
    )
    eng = mk_engine(spark, pages, str(tmp_path / "wh"), handler)
    eng.seed(_seed_df(spark, [url]))
    eng.run(2)
    res = eng.results_df().collect()
    assert len(res) == 1
    payload = json.loads(res[0].result)
    assert payload["src"] == url and payload["n_links"] == 3
    # the custom parse kept exactly ONE follow
    assert eng.frontier.filter(F.col("callback") == "detail").count() == 1
    pages.unpersist()


def test_http_fetch_mode_against_local_stub(spark, tmp_path):
    """S6 production path: the mapInPandas pooled-GET stage against a
    local HTTP stub — 200s parsed, 404 fails into the retry ladder,
    conditional refetch 304s via If-None-Match (tornado_fetcher.py
    :76-84 pool, :273-291 etag)."""
    import hashlib
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Stub(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def do_GET(self):  # noqa: N802
            if self.path.startswith("/missing"):
                self.send_response(404)
                self.end_headers()
                return
            body = (
                f"<html><head><title>T{self.path}</title></head>"
                f"<body><a href='/p/9'>n</a></body></html>"
            ).encode()
            etag = hashlib.md5(body).hexdigest()[:8]
            if self.headers.get("If-None-Match") == etag:
                self.send_response(304)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("ETag", etag)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        pages = spark.createDataFrame([], "url string, html binary")
        eng = mk_engine(
            spark, pages, str(tmp_path / "wh"), RECRAWL,
            fetch_mode="http", epoch_interval=5.0,
        )
        eng.seed(_seed_df(spark, [f"{base}/p/1", f"{base}/p/2", f"{base}/missing"]))
        m0 = eng.run_epoch()
        assert m0["fetched_ok"] == 2 and m0["fetch_error"] == 1
        assert m0["fetch_missing"] == 0  # every task returns a row
        rows = {r.url: r for r in eng.frontier.collect()}
        assert rows[f"{base}/p/1"].status == FR.ACTIVE  # re-armed (W6)
        assert rows[f"{base}/p/1"].last_etag  # etag tracked for next GET
        assert rows[f"{base}/missing"].retried == 1  # retry ladder (W5)
        m1 = eng.run_epoch()  # auto_recrawl refetch: stub answers 304
        assert m1["fetched_not_modified"] == 2 and m1["fetched_ok"] == 2
        # 304 kept old content: one result per page, not two
        assert eng.results_df(latest_only=False).count() == 2
    finally:
        srv.shutdown()


def test_processor_index_page_golden(spark, tmp_path):
    """Reference golden (tests/test_processor.py:357-399
    test_40_index_page): 4 anchors -> 3 follows after within-page dedup,
    absolutized + canonicalized byte-identically — `http://binux.me`
    gains the root path, the CJK path is percent-quoted uppercase, the
    duplicate collapses, document order preserved."""
    html = (
        "<html><body>"
        "<a href='http://binux.me'>binux</a>"
        "<a href='http://binux.me/中文'>binux</a>"
        "<a href='http://binux.me/1'>1</a>"
        "<a href='http://binux.me/1'>2</a>"
        "</body></html>"
    ).encode("utf-8")
    pages = spark.createDataFrame(
        [("http://host1.test/p/0", bytearray(html))], "url string, html binary"
    )
    handler = Handler(
        callbacks={"index_page": Callback(extract_links=True, link_callback="detail")}
    )
    eng = mk_engine(spark, pages, str(tmp_path / "wh"), handler)
    eng.seed(_seed_df(spark, ["http://host1.test/p/0"]))
    eng.run(2)  # epoch 0 fetches+parses, epoch 1 ingests the follows
    follows = (
        eng.frontier.filter(F.col("callback") == "detail").orderBy("seq").collect()
    )
    assert [r.url for r in follows] == [
        "http://binux.me/",
        "http://binux.me/%E4%B8%AD%E6%96%87",
        "http://binux.me/1",
    ]


def test_not_send_status_drops_ephemeral_task(spark, tmp_path):
    handler = Handler(
        callbacks={
            "index_page": Callback(),
            "_on_message": Callback(emit_result=True, not_send_status=True),
        }
    )
    pages = synth.gen_pages(spark, 40, 8, show=2).cache()
    eng = mk_engine(spark, pages, str(tmp_path / "wh"), handler)
    eng.send_message("bench", "ping")
    eng.run(2)
    # the message result was emitted but no status reached the
    # scheduler: the ephemeral control task left no frontier row
    assert eng.results_df() is not None and eng.results_df().count() == 1
    assert eng.frontier.filter(F.col("callback") == "_on_message").count() == 0
    pages.unpersist()


def test_http_fetch_options_plumbed_end_to_end(spark, tmp_path):
    """Missing #5 closure: the task's `fetch` JSON compartment
    (method/headers/cookies/data/user_agent — tornado_fetcher.py:232-301)
    reaches the wire in fetch_mode='http'.  A POST with custom headers +
    cookie + body hits a local stub that echoes what it saw."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen = {}

    class Stub(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def _reply(self):
            body = b"<html><head><title>ok</title></head><body></body></html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            seen[self.path] = {
                "method": "GET",
                "headers": dict(self.headers),
                "body": None,
            }
            self._reply()

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            seen[self.path] = {
                "method": "POST",
                "headers": dict(self.headers),
                "body": self.rfile.read(n).decode(),
            }
            self._reply()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        from crawler_pyspider_spark.functions.crawl_api import (
            CrawlBuilder,
            builders_to_df,
        )

        builders = [
            CrawlBuilder(f"{base}/post").update_kwargs(
                {
                    "method": "POST",
                    "data": "a=1&b=2",
                    "headers": {"X-Custom": "yes"},
                    "cookies": {"sid": "s1"},
                }
            ),
            CrawlBuilder(f"{base}/plain"),
        ]
        pages = spark.createDataFrame([], "url string, html binary")
        eng = mk_engine(
            spark, pages, str(tmp_path / "wh"), RESULT_ONLY, fetch_mode="http"
        )
        eng.seed(builders_to_df(spark, builders))
        m = eng.run_epoch()
        assert m["fetched_ok"] == 2
        assert seen["/post"]["method"] == "POST"
        assert seen["/post"]["body"] == "a=1&b=2"
        assert seen["/post"]["headers"].get("X-Custom") == "yes"
        assert seen["/post"]["headers"].get("Cookie") == "sid=s1"
        assert seen["/plain"]["method"] == "GET"
        assert "X-Custom" not in seen["/plain"]["headers"]
        # the fetch compartment persisted on the frontier row (taskdb
        # task['fetch'] parity) — a recrawl would re-use it
        row = eng.frontier.filter(F.col("url") == f"{base}/post").first()
        assert json.loads(row.fetch)["method"] == "POST"
    finally:
        srv.shutdown()


def test_http_multipart_post_round_trips(spark, tmp_path):
    """X9 closure end-to-end: CrawlBuilder.set_files → multipart body
    (reference base_handler.py:283-294 + libs/url.py:21-26) → base64
    fetch compartment → fetch_http POSTs the exact bytes with the
    boundary-bearing Content-Type to a local stub."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen = {}

    class Stub(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            seen[self.path] = {
                "content_type": self.headers.get("Content-Type", ""),
                "body": self.rfile.read(n),
            }
            body = b"<html><head><title>up</title></head><body></body></html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        from crawler_pyspider_spark.functions.crawl_api import (
            CrawlBuilder,
            builders_to_df,
        )

        b = CrawlBuilder(f"{base}/upload").set_files(
            {"doc": ("blob.bin", b"\x00\xfe binary \xff")}
        ).set_kwargs_kv("data", {"field": "value"})
        pages = spark.createDataFrame([], "url string, html binary")
        eng = mk_engine(
            spark, pages, str(tmp_path / "wh"), RESULT_ONLY, fetch_mode="http"
        )
        eng.seed(builders_to_df(spark, [b]))
        m = eng.run_epoch()
        assert m["fetched_ok"] == 1
        got = seen["/upload"]
        assert got["content_type"].startswith("multipart/form-data; boundary=")
        bnd = got["content_type"].split("boundary=")[1].encode()
        assert got["body"].startswith(b"--" + bnd)
        assert got["body"].endswith(b"--" + bnd + b"--\r\n")
        assert b'name="field"\r\n\r\nvalue' in got["body"]
        assert b'filename="blob.bin"' in got["body"]
        assert b"\x00\xfe binary \xff" in got["body"]  # byte-exact
    finally:
        srv.shutdown()


def test_http_response_cookies_chain_and_persist(spark, tmp_path):
    """Response-cookie propagation (tornado_fetcher.py:240-252 session
    CookieJar + :429-450 result cookies): a Set-Cookie on a redirect's
    first hop is presented to the second hop, the final jar persists on
    the frontier row (last_cookies), and the task's next fetch (auto
    recrawl) presents it again."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    hits = []  # (path, cookie-header)

    class Stub(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def do_GET(self):  # noqa: N802
            hits.append((self.path, self.headers.get("Cookie")))
            if self.path == "/login":
                self.send_response(302)
                self.send_header("Set-Cookie", "sid=abc123; Path=/")
                self.send_header("Location", "/account")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = b"<html><head><title>in</title></head><body></body></html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        pages = spark.createDataFrame([], "url string, html binary")
        eng = mk_engine(
            spark, pages, str(tmp_path / "wh"), RECRAWL,
            fetch_mode="http", epoch_interval=5.0,
        )
        eng.seed(_seed_df(spark, [f"{base}/login"]))
        m = eng.run_epoch()
        assert m["fetched_ok"] == 1 and m["redirected"] == 1
        # hop 1 had no cookie; hop 2 presents hop 1's Set-Cookie
        assert hits[0] == ("/login", None)
        assert hits[1] == ("/account", "sid=abc123")
        # the jar persisted on the frontier row
        row = eng.frontier.filter(F.col("status") == FR.ACTIVE).first()
        assert json.loads(row.last_cookies) == {"sid": "abc123"}
        # auto_recrawl refetch: the stored jar is presented from hop 1
        m1 = eng.run_epoch()
        assert m1["selected"] == 1
        assert hits[2] == ("/login", "sid=abc123")
    finally:
        srv.shutdown()


def test_http_redirect_budget_enforced(spark, tmp_path):
    """max_redirects bounds the per-task hop budget in fetch_mode='http'
    (tornado_fetcher.py max_redirects): an endless 302 chain must stop
    after exactly max_redirects hops and land in the retry ladder as a
    non-200, and max_redirects=0 must not follow even one hop."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    hits = []

    class Stub(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def do_GET(self):  # noqa: N802
            hits.append(self.path)
            n = int(self.path.rsplit("/", 1)[-1])
            self.send_response(302)
            self.send_header("Location", f"/r/{n + 1}")
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        pages = spark.createDataFrame([], "url string, html binary")
        eng = mk_engine(
            spark, pages, str(tmp_path / "wh2"), RESULT_ONLY,
            fetch_mode="http", max_redirects=2, epoch_interval=5.0,
        )
        eng.seed(_seed_df(spark, [f"{base}/r/0"]))
        m = eng.run_epoch()
        assert m["fetched_ok"] == 0 and m["fetch_error"] == 1
        # origin + exactly 2 followed hops, then the budget stops it
        assert hits == ["/r/0", "/r/1", "/r/2"]
        row = eng.frontier.first()
        assert row.retried == 1  # non-200 -> retry ladder

        hits.clear()
        eng0 = mk_engine(
            spark, pages, str(tmp_path / "wh0"), RESULT_ONLY,
            fetch_mode="http", max_redirects=0, epoch_interval=5.0,
        )
        eng0.seed(_seed_df(spark, [f"{base}/r/0"]))
        m0 = eng0.run_epoch()
        assert m0["fetched_ok"] == 0 and m0["fetch_error"] == 1
        assert hits == ["/r/0"]  # zero hops followed
    finally:
        srv.shutdown()


def test_http_fetch_timeout_is_an_error_not_a_hang(spark, tmp_path):
    """fetch_timeout bounds each request (tornado_fetcher.py
    connect/request timeout): a handler that stalls longer than the
    budget fails into the retry ladder; fast URLs in the same batch are
    unaffected."""
    import threading
    import time as _time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Stub(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def do_GET(self):  # noqa: N802
            if self.path.startswith("/slow"):
                _time.sleep(5)
            body = b"<html><head><title>ok</title></head><body></body></html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        pages = spark.createDataFrame([], "url string, html binary")
        eng = mk_engine(
            spark, pages, str(tmp_path / "wh"), RESULT_ONLY,
            fetch_mode="http", fetch_timeout=1.0, epoch_interval=5.0,
        )
        eng.seed(_seed_df(spark, [f"{base}/fast", f"{base}/slow"]))
        m = eng.run_epoch()
        assert m["fetched_ok"] == 1 and m["fetch_error"] == 1
        rows = {r.url: r for r in eng.frontier.collect()}
        assert rows[f"{base}/slow"].retried == 1
        assert rows[f"{base}/fast"].retried == 0
    finally:
        srv.shutdown()
