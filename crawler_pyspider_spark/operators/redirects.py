"""Redirect-chain resolution for the fetch stage (S6 extension).

The reference fetcher follows redirects MANUALLY with a hop budget and
reports both the original and the final URL (tornado_fetcher.py:371-427:
``follow_redirects`` loop, ``max_redirects`` default 5, the response
carries ``orig_url`` vs ``url``; e2e cases tests/test_fetcher_processor.py
:174+).  The task's identity stays keyed on the ORIGINAL url — the
scheduler never learns about intermediate hops.

Set-at-a-time this becomes an iterative SPLIT-join: hop k joins only the
rows still pointing at a redirecting URL (after the first hop that is a
tiny fraction of the batch) against the redirect edge table
``(src_url, location)`` — settled rows leave the loop immediately, so
``max_hops`` bounds the number of joins but each join's left side only
shrinks.  The edge table is the 30x subset of the pages table (dim-sized
relative to the web); the batch side is ≤ loop_limit rows, so AQE
broadcasts whichever side fits.

Rows that are STILL on a redirect after ``max_hops`` keep their last
location as ``url``; the fetch join then either finds that page (whose
30x status fails the status gate) or misses entirely — both fold to a
fetch failure, the reference's "too many redirects" error path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REDIRECT_STATUSES = (301, 302, 303, 307, 308)
DEFAULT_MAX_REDIRECTS = 5  # tornado_fetcher.py max_redirects default


def redirect_edges(pages: DataFrame) -> DataFrame | None:
    """The 30x edge table ``(src_url, location)`` of a pages frame, or
    None when the frame has no ``location`` column (an all-200 world —
    resolution is then a zero-cost no-op)."""
    if "location" not in pages.columns:
        return None
    sc = F.col("status_code") if "status_code" in pages.columns else F.lit(200)
    return (
        pages.filter(sc.isin(list(REDIRECT_STATUSES)) & F.col("location").isNotNull())
        .select(F.col("url").alias("src_url"), F.col("location"))
    )


def resolve_redirects(
    batch: DataFrame,
    edges: DataFrame | None,
    max_hops: int = DEFAULT_MAX_REDIRECTS,
) -> DataFrame:
    """Rewrite ``url`` to the end of its redirect chain (≤ ``max_hops``),
    appending ``orig_url`` (the identity URL — taskids stay keyed on it)
    and ``_redirects`` (hops followed).  ``edges`` None ⇒ appends the
    two columns and does nothing else."""
    out = batch.withColumn("orig_url", F.col("url")).withColumn(
        "_redirects", F.lit(0)
    )
    if edges is None:
        return out
    settled = []
    cur = out
    for _ in range(max_hops):
        j = cur.join(edges, cur["url"] == edges["src_url"], "left")
        settled.append(j.filter(F.col("location").isNull()).drop("src_url", "location"))
        cur = (
            j.filter(F.col("location").isNotNull())
            .withColumn("url", F.col("location"))
            .withColumn("_redirects", F.col("_redirects") + 1)
            .drop("src_url", "location")
        )
    # budget exhausted: keep the last hop's url (fails the status gate
    # or the fetch join downstream — the reference's redirect-limit error)
    settled.append(cur)
    res = settled[0]
    for s in settled[1:]:
        res = res.unionByName(s)
    return res
