"""URL canonicalization + task identity.

Reproduces the semantics of the reference's URL pipeline (studied at
``pyspider/libs/url.py:29-70`` ``_build_url``/``quote_chinese`` and
``pyspider/libs/base_handler.py:282,323-342`` — re-implemented from the
public urllib API, not copied):

1. ``canonicalize_url(url)``:
   - parse with ``urllib.parse.urlparse``
   - netloc IDNA-encoded (unicode domain support)
   - empty path -> ``/``
   - re-assemble with ``urlunparse`` (fragment preserved — the
     reference hashes the full URL including fragment)
   - percent-quote every non-ASCII byte of the UTF-8 encoding
     (reference ``quote_chinese``: bytes < 128 pass through latin-1,
     bytes >= 128 -> ``%XX`` uppercase)
2. ``taskid = md5(canonical_url)`` lowercase hex
   (reference ``libs/utils.py:24`` + ``base_handler.py:340-342``) —
   computed JVM-side with ``F.md5`` so it never leaves codegen.
3. ``host = netloc`` of the canonical URL (reference
   ``tornado_fetcher.py:305-306``) — JVM-side ``F.parse_url``.

Scale note: canonicalization is the only Python step on the ingest
path; it is a single Arrow-batched pandas UDF applied once per URL
before hashing, so the 10^10-row ingest stays one narrow map stage.
"""

from __future__ import annotations

from urllib.parse import urlparse, urlunparse, urljoin

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _idna_netloc(netloc: str) -> str:
    """IDNA-encode the hostname part of a netloc, preserving port/userinfo."""
    if not netloc:
        return netloc
    try:
        return netloc.encode("idna").decode("utf-8")
    except (UnicodeError, UnicodeDecodeError):
        # pure-ASCII netlocs with ports/userinfo fail 'idna' codec; they
        # need no encoding anyway
        return netloc


def _quote_non_ascii(url: str) -> str:
    """Percent-quote non-ASCII bytes of the UTF-8 encoding, uppercase hex.

    ASCII bytes pass through unchanged (including spaces and reserved
    characters — matches reference behaviour exactly).
    """
    raw = url.encode("utf-8")
    if max(raw, default=0) < 128:
        return url
    return "".join(
        chr(b) if b < 128 else "%%%02X" % b for b in raw
    )


def canonicalize_url_py(url: str) -> str:
    """Pure-python canonicalizer (unit-testable; used inside the UDF)."""
    if url is None:
        return None
    url = url.strip()
    scheme, netloc, path, params, query, fragment = urlparse(url)
    netloc = _idna_netloc(netloc)
    if not path:
        path = "/"
    rebuilt = urlunparse([scheme, netloc, path, params, query, fragment])
    return _quote_non_ascii(rebuilt)


@F.pandas_udf(StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer: Series[str] -> Series[str]."""
    return urls.map(canonicalize_url_py, na_action="ignore")


def urljoin_py(base: str, link: str) -> str:
    return urljoin(base, link)


def taskid_col(canonical_url: Column) -> Column:
    """md5 hex of the canonical URL — identical to the reference's
    ``md5string(url)`` (md5 of UTF-8, lowercase hex).  JVM-side."""
    return F.md5(canonical_url)


def host_col(url: Column) -> Column:
    """Host (netloc sans userinfo/port) of a URL, JVM-side."""
    return F.parse_url(url, F.lit("HOST"))


def host_bucket_col(url: Column, n_buckets: int = 1024) -> Column:
    """Stable bucket id for repartition-by-host before fetch scheduling.

    ``pmod(xxhash64(host), n_buckets)`` — cheap, JVM-side, and stable
    across epochs so the frontier can be written pre-bucketed and the
    select stage shuffles by an int key instead of a string host.
    """
    return F.pmod(F.xxhash64(host_col(url)), F.lit(n_buckets)).cast("int")


INTERNAL_HOST = "_internal_"  # data: URIs / control rows have no netloc


def with_url_identity(df, url_col: str = "url", n_buckets: int = 1024):
    """Append url_canon / taskid / host / host_bucket columns.

    The single canonicalization pandas UDF runs once; everything
    downstream (md5, host parse, bucket hash) is JVM codegen.
    Hostless URLs (data: control tasks) map to INTERNAL_HOST so they
    still flow through the per-host politeness machinery.
    """
    out = df.withColumn("url_canon", canonicalize_url(F.col(url_col)))
    out = out.withColumn(
        "host", F.coalesce(host_col(F.col("url_canon")), F.lit(INTERNAL_HOST))
    )
    return (
        out.withColumn("taskid", taskid_col(F.col("url_canon")))
        .withColumn(
            "host_bucket",
            F.pmod(F.xxhash64(F.col("host")), F.lit(n_buckets)).cast("int"),
        )
    )
