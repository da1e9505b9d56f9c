"""URL canonicalization + task identity.

Ports the semantics the reference pins at ``pyspider/libs/url.py:29-70``
(_build_url/quote_chinese) and ``base_handler.py:340-342`` (md5 taskid),
exercised by ``tests/test_processor.py:357-399`` (absolutize + quote).
"""

import hashlib

from pyspark.sql import functions as F

from crawler_pyspider_spark.functions.urls import (
    canonicalize_url_py,
    with_url_identity,
)


class TestCanonicalizePy:
    def test_default_path(self):
        assert canonicalize_url_py("http://example.com") == "http://example.com/"

    def test_idna_netloc(self):
        assert canonicalize_url_py("http://中文.test/p") == "http://xn--fiq228c.test/p"

    def test_quote_non_ascii_path(self):
        # utf-8 bytes of 中 = E4 B8 AD -> uppercase percent escapes
        assert canonicalize_url_py("http://a.test/中") == "http://a.test/%E4%B8%AD"

    def test_ascii_passthrough(self):
        u = "http://a.test/p/1?q=2&r=3#frag"
        assert canonicalize_url_py(u) == u

    def test_strips_whitespace(self):
        assert canonicalize_url_py("  http://a.test/x ") == "http://a.test/x"

    def test_fragment_preserved(self):
        # reference hashes the full url incl. fragment
        assert canonicalize_url_py("http://a.test/#x") == "http://a.test/#x"


class TestIdentityColumns:
    def test_taskid_is_md5_of_canonical(self, spark):
        df = spark.createDataFrame([("http://example.com",)], "url string")
        row = with_url_identity(df).collect()[0]
        assert row.url_canon == "http://example.com/"
        assert row.taskid == hashlib.md5(b"http://example.com/").hexdigest()
        assert row.host == "example.com"
        assert 0 <= row.host_bucket < 1024

    def test_same_host_same_bucket(self, spark):
        df = spark.createDataFrame(
            [("http://h.test/a",), ("http://h.test/b",), ("http://other.test/a",)],
            "url string",
        )
        rows = with_url_identity(df).select("host", "host_bucket").collect()
        by_host = {}
        for r in rows:
            by_host.setdefault(r.host, set()).add(r.host_bucket)
        assert len(by_host["h.test"]) == 1

    def test_md5_matches_jvm_and_python(self, spark):
        urls = [f"http://h{i}.test/p/{i}" for i in range(50)]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        out = {r.url_canon: r.taskid for r in with_url_identity(df).collect()}
        for u in urls:
            assert out[u] == hashlib.md5(u.encode()).hexdigest()
