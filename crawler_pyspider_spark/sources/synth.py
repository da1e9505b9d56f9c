"""Deterministic synthetic web (M0 fixture world).

Models the reference's bench page server (studied at
``pyspider/webui/bench_test.py:18-33``: a page with ``show`` out-links
into a ``total``-sized URL id space) but fully deterministic: all
randomness is md5-derived from the row id, **no RNG, no wall-clock**, so
any scale regenerates bit-identically and — crucially — the same link
graph is re-derivable in ANSI SQL (DuckDB oracle) via::

    md5int(s)  = CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
    host(i)    = n_hosts // (md5int('h' || i) % n_hosts + 1)   # integer Zipf
    url(i)     = 'http://host' || host(i) || '.test/p/' || i
    child(i,k) = md5int(url(i) || '#' || k) % n_pages

The integer-Zipf host law gives host 1 ~half the pages, host 2 ~17%,
a long tail after — exactly the skew the salted politeness ranking
(SURVEY.md §4) must survive.

Page HTML embeds the out-links as anchors.  Deterministic variants
exercise the extraction edge cases the reference tests pin down
(``tests/test_processor.py:357-399``):

- ``i % 7 == 3``: links to same-host children are written as *relative*
  hrefs (absolutize reproduces the canonical URL — graph unchanged);
- ``i % 11 == 5``: page body contains Chinese text and is encoded
  gb18030 with a ``<meta charset="gb2312">`` declaration (exercises
  charset sniff + the gb2312→gb18030 upgrade);
- ``i % 13 == 7``: non-ASCII anchor text (decode robustness).

Everything except the final charset-encode is JVM-side expression code
(``spark.range`` + ``F.transform``/``F.concat_ws``), so generating a
10^8-page world is a single narrow codegen stage; the encode is one
Arrow pandas UDF pass.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

from crawler_pyspider_spark.functions.extract import decode_html

BASE_TS = "2024-01-01 00:00:00"


def md5int(col_or_str) -> F.Column:
    """First 60 bits of md5 as a non-negative BIGINT (DuckDB-replicable)."""
    return F.conv(F.substring(F.md5(col_or_str), 1, 15), 16, 10).cast("long")


def host_id(i: F.Column, n_hosts: int) -> F.Column:
    """Integer-Zipf host law: host = n_hosts // (r+1), r uniform [0,n_hosts)."""
    r = md5int(F.concat(F.lit("h"), i.cast("string"))) % n_hosts
    return (F.lit(n_hosts) / (r + 1)).cast("long")


def url_of(i: F.Column, n_hosts: int) -> F.Column:
    return F.concat(
        F.lit("http://host"),
        host_id(i, n_hosts).cast("string"),
        F.lit(".test/p/"),
        i.cast("string"),
    )


@F.pandas_udf(BinaryType())
def _encode_html(html: pd.Series, charset: pd.Series) -> pd.Series:
    return pd.Series(
        [h.encode(c) if h is not None else None for h, c in zip(html, charset)]
    )


def gen_pages(
    spark: SparkSession,
    n_pages: int = 1000,
    n_hosts: int = 64,
    show: int = 8,
    body_kb: int = 0,
    status_every: int | None = None,
    etag_salt: str = "",
    redirect_every: int | None = None,
) -> DataFrame:
    """The pages table ``(url, warc_ts, html, text, lang)`` per
    BASELINE.json input_hint, plus fetch-protocol columns
    ``status_code``/``etag`` (F6 — the engine treats their absence as an
    all-200, no-etag web).

    ``body_kb`` adds ~that many KB of deterministic filler prose per
    page (real Common-Crawl pages are tens of KB; the bench uses this
    so extraction compute reflects the true workload instead of
    1 KB toy pages).

    ``status_every``: when set, ``md5int(url||'#sc') % status_every``
    picks deterministic non-200 pages — 0→404, 1→403, 2→500 (≈3/N of
    pages each); None keeps the world all-200.

    ``etag_salt`` feeds the etag hash — regenerate with a different salt
    to model every page's content changing (the etags rotate, so
    conditional refetches stop 304ing).

    ``redirect_every``: when set, pages with ``md5int(url||'#rd') %
    redirect_every == 0`` answer **301** with ``location`` = the
    canonical url of page ``(i+1) % n_pages`` (SQL-re-derivable;
    consecutive redirect ids form multi-hop chains, exercising the hop
    budget).  The ``location`` column is always present (NULL when not
    redirecting) so the engine's redirect path keys off the column, not
    the parameter."""
    df = spark.range(n_pages).withColumnRenamed("id", "i")
    i = F.col("i")
    df = df.withColumn("host_id", host_id(i, n_hosts))
    df = df.withColumn("url", url_of(i, n_hosts))

    # out-links: child ids + their canonical urls, JVM-side
    ks = F.sequence(F.lit(0), F.lit(show - 1))
    child_id = lambda k: md5int(  # noqa: E731
        F.concat(F.col("url"), F.lit("#"), k.cast("string"))
    ) % F.lit(n_pages)
    df = df.withColumn("child_ids", F.transform(ks, child_id))
    df = df.withColumn(
        "child_urls", F.transform(F.col("child_ids"), lambda c: url_of(c, n_hosts))
    )
    df = df.withColumn(
        "child_hosts", F.transform(F.col("child_ids"), lambda c: host_id(c, n_hosts))
    )

    rel_variant = i % 7 == F.lit(3)
    gb_variant = i % 11 == F.lit(5)
    cjk_anchor = i % 13 == F.lit(7)

    # anchor for child at position k: relative if rel_variant & same host
    def anchor(c_url, c_host, c_id):
        href = F.when(
            rel_variant & (c_host == F.col("host_id")),
            F.concat(F.lit("/p/"), c_id.cast("string")),
        ).otherwise(c_url)
        text = F.when(cjk_anchor, F.concat(F.lit("跟随 "), c_id.cast("string"))).otherwise(
            F.concat(F.lit("follow "), c_id.cast("string"))
        )
        return F.concat(F.lit("<a href='"), href, F.lit("'>"), text, F.lit("</a><br>"))

    anchors = F.zip_with(
        F.col("child_urls"),
        F.arrays_zip(F.col("child_hosts"), F.col("child_ids")),
        lambda u, hz: anchor(u, hz["child_hosts"], hz["child_ids"]),
    )
    meta = F.when(gb_variant, F.lit('<meta charset="gb2312">')).otherwise(
        F.lit('<meta charset="utf-8">')
    )
    body_extra = F.when(gb_variant, F.lit("<p>中文测试页面内容。</p>")).otherwise(F.lit(""))
    if body_kb:
        # ~64-char sentence repeated 16×body_kb times ≈ body_kb KB
        filler = F.repeat(
            F.concat(
                F.lit("the quick brown fox jumps over the lazy dog near host "),
                F.col("host_id").cast("string"),
                F.lit(" page "),
                i.cast("string"),
                F.lit(". "),
            ),
            body_kb * 16,
        )
        body_extra = F.concat(body_extra, F.lit("<p>"), filler, F.lit("</p>"))
    html_str = F.concat(
        F.lit("<html><head>"),
        meta,
        F.lit("<title>Page "),
        i.cast("string"),
        F.lit("</title></head><body>"),
        body_extra,
        F.concat_ws("", anchors),
        F.lit("</body></html>"),
    )
    charset = F.when(gb_variant, F.lit("gb18030")).otherwise(F.lit("utf-8"))
    df = df.withColumn("html", _encode_html(html_str, charset))
    # text = reference-extracted text (decode of html) — oracle column
    df = df.withColumn("_charset", charset)
    df = df.withColumn("text", _decoded_text(F.col("html")))
    df = df.withColumn(
        "warc_ts",
        F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(secs=(i % 86400).cast("double")),
    )
    df = df.withColumn(
        "lang", F.element_at(F.array(*[F.lit(x) for x in ["en", "es", "de", "zh"]]), (i % 4 + 1).cast("int"))
    )
    if status_every:
        sc = md5int(F.concat(F.col("url"), F.lit("#sc"))) % status_every
        status = (
            F.when(sc == 0, 404).when(sc == 1, 403).when(sc == 2, 500).otherwise(200)
        )
    else:
        status = F.lit(200)
    if redirect_every:
        is_rd = md5int(F.concat(F.col("url"), F.lit("#rd"))) % redirect_every == 0
        status = F.when(is_rd, 301).otherwise(status)
        location = F.when(is_rd, url_of((i + 1) % n_pages, n_hosts))
    else:
        location = F.lit(None).cast("string")
    df = df.withColumn("status_code", status.cast("int"))
    df = df.withColumn("location", location)
    df = df.withColumn(
        "etag",
        F.substring(
            F.md5(F.concat(F.lit("etag:" + etag_salt + ":"), F.col("url"))), 1, 16
        ),
    )
    return df.select(
        "url", "warc_ts", "html", "text", "lang", "status_code", "location", "etag"
    )


@F.pandas_udf(StringType())
def _decoded_text(html: pd.Series) -> pd.Series:
    return html.map(decode_html, na_action="ignore")


def gen_seeds(
    spark: SparkSession,
    pages: DataFrame,
    n_seeds: int = 10,
    project: str = "bench",
) -> DataFrame:
    """Initial frontier: host-diverse prefix — the first page of every
    host first (rank-within-host 1), then second pages, etc., until
    n_seeds urls.  For n_seeds ≤ #hosts this is exactly one url per
    distinct host.  A few rows get non-zero priority to pin ordering
    tests (reference ``tests/test_task_queue.py:24-42``)."""
    w_host = F.row_number().over(
        Window.partitionBy(F.parse_url(F.col("url"), F.lit("HOST"))).orderBy("url")
    )
    seeds = (
        pages.select("url")
        .withColumn("rn_host", w_host)
        .orderBy("rn_host", "url")
        .limit(n_seeds)
        .drop("rn_host")
    )
    return (
        seeds.withColumn("project", F.lit(project))
        .withColumn("priority", (md5int(F.col("url")) % 3).cast("int"))
        .withColumn("exetime", F.lit(None).cast("timestamp"))
    )


def gen_robots(spark: SparkSession, n_hosts: int = 64) -> DataFrame:
    """Per-host robots rules: host 2 (and every hid%20==3 host)
    disallows the '/p/1' prefix subset, host 4 disallows everything
    (mirrors the gating the reference applies at
    ``tornado_fetcher.py:303-338,377-382``).

    Hosts 2 and 4 are chosen because the integer-Zipf law
    ``host = K // (r+1)`` has gaps in its value range; 1/2/4 occur for
    every power-of-two host count, so the rules always bind."""
    hosts = spark.range(1, n_hosts + 1).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
        F.col("id").alias("hid"),
    )
    rules = hosts.withColumn(
        "disallow_prefixes",
        F.when(F.col("hid") == 4, F.array(F.lit("/")))
        .when((F.col("hid") == 2) | (F.col("hid") % 20 == 3), F.array(F.lit("/p/1")))
        .otherwise(F.array().cast("array<string>")),
    ).withColumn("fetched_ts", F.to_timestamp(F.lit(BASE_TS)))
    return rules.drop("hid")


def gen_politeness(
    spark: SparkSession, n_hosts: int = 64, rate: float = 1.0, burst: float | None = None
) -> DataFrame:
    """Per-host token-bucket config (reference defaults rate=1,
    burst=rate*10 — ``scheduler/token_bucket.py:23-31``,
    ``database/base/projectdb.py:21-22``)."""
    if burst is None:
        burst = rate * 10
    return spark.range(1, n_hosts + 1).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".test")).alias("key"),
        F.lit(float(rate)).alias("rate"),
        F.lit(float(burst)).alias("burst"),
    )
