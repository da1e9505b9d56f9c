"""Production HTTP fetch stage (S6) — partition-parallel pooled GETs.

The sandbox engine answers fetches by broadcast-joining the select batch
against a ``pages`` table; on a real cluster the fetch is network I/O.
This module implements that path Spark-natively, mirroring the
reference's fetcher semantics (tornado_fetcher.py):

- the caller repartitions the select batch by ``host_bucket`` first, so
  a partition holds few hosts (connection reuse + politeness locality —
  the north rule's "repartition-by-host-bucket before fetch
  scheduling");
- ``mapInPandas`` runs a ``pool_size``-thread pool per partition (the
  reference fetcher's ``poolsize`` connection pool,
  tornado_fetcher.py:76-84) issuing conditional GETs — ``If-None-Match``
  from the task's ``last_etag`` (tornado_fetcher.py:273-281);
- every task returns a row: body/status/etag on success, 304 with no
  body when unmodified, the HTTP error code on 4xx/5xx, 599 on
  connection errors (tornado_fetcher.py handle_error's canonical code);
- the output schema appends the same ``_p_html/_p_status/_p_etag``
  columns the pages-join path produces, so the engine's downstream
  status gate + parse stage is byte-identical for both modes.

Only stdlib ``urllib`` is used (aiohttp/tornado are not in this
container); a thread pool is the right concurrency shape for blocking
I/O and keeps the Arrow batch boundary intact.
"""

from __future__ import annotations

import urllib.error
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

USER_AGENT = "spark-frontier/1.0"
CONNECTION_ERROR_CODE = 599  # tornado_fetcher handle_error convention


def fetch_one(url: str, etag: str | None, timeout: float):
    """One conditional GET -> (body|None, status_code, etag|None)."""
    req = urllib.request.Request(url, headers={"User-Agent": USER_AGENT})
    if etag:
        req.add_header("If-None-Match", etag)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read(), int(resp.status), resp.headers.get("ETag")
    except urllib.error.HTTPError as e:
        if e.code == 304:
            return None, 304, etag
        return None, int(e.code), None
    except Exception:
        return None, CONNECTION_ERROR_CODE, None


def fetch_http(
    tasks: DataFrame, pool_size: int = 100, timeout: float = 20.0
) -> DataFrame:
    """Fetch every task row over HTTP; appends _p_html/_p_status/_p_etag.

    All input columns pass through unchanged (the frontier row IS the
    task context), so the result slots into the engine exactly where the
    pages broadcast-join result does.
    """
    # fresh StructType — StructType.add would MUTATE the input frame's
    # cached schema and break mapInPandas's column resolution
    out_schema = StructType(
        list(tasks.schema.fields)
        + [
            StructField("_p_html", BinaryType()),
            StructField("_p_status", IntegerType()),
            StructField("_p_etag", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=pool_size) as pool:
            for pdf in batches:
                pdf = pdf.copy()
                if len(pdf) == 0:
                    pdf["_p_html"] = pd.Series([], dtype=object)
                    pdf["_p_status"] = pd.Series([], dtype="int32")
                    pdf["_p_etag"] = pd.Series([], dtype=object)
                    yield pdf
                    continue
                etags = (
                    pdf["last_etag"]
                    if "last_etag" in pdf.columns
                    else pd.Series([None] * len(pdf))
                )
                results = list(
                    pool.map(
                        lambda t: fetch_one(t[0], t[1], timeout),
                        zip(pdf["url"], etags),
                    )
                )
                pdf["_p_html"] = [r[0] for r in results]
                pdf["_p_status"] = pd.array(
                    [r[1] for r in results], dtype="int32"
                )
                pdf["_p_etag"] = [r[2] for r in results]
                yield pdf

    return tasks.mapInPandas(run, schema=out_schema)
