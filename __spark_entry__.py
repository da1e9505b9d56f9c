"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a 2-epoch crawl of a synthetic
Common-Crawl-style world derived from the sf0.001 ``documents`` table
(the full frontier engine: canonicalize → dedup → politeness-ranked
select → robots gate → fetch join → pandas-UDF extraction → results).

``queries()`` / ``oracle_sql()`` — one entry per operator family from
SURVEY.md §2 plus the training-data ops; implementations live in
``crawler_pyspider_spark/queries.py`` with file:line citations.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawler_pyspider_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: run the crawl engine end-to-end on a small synthetic
    web seeded from sf0.001 documents; return the results table."""
    from pyspark.sql import functions as F

    from crawler_pyspider_spark.engine import BENCH_HANDLER, CrawlEngine
    from crawler_pyspider_spark.sources import synth

    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    n_pages, n_hosts = min(int(n_docs), 400), 16
    pages = synth.gen_pages(spark, n_pages=n_pages, n_hosts=n_hosts, show=5)
    robots = synth.gen_robots(spark, n_hosts)
    politeness = synth.gen_politeness(spark, n_hosts, rate=1000.0, burst=10000.0)
    wh = tempfile.mkdtemp(prefix="spark_entry_wh_")
    eng = CrawlEngine(
        spark, pages, robots, politeness, wh,
        handler=BENCH_HANDLER, loop_limit=100000,
    )
    eng.seed(synth.gen_seeds(spark, pages, 5))
    eng.run(2)
    res = eng.results_df()
    if res is None:
        return spark.createDataFrame(
            [], "taskid string, project string, url string, result string, updatetime double"
        )
    return res.select("taskid", "project", "url", "result", "updatetime")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query — every ``queries()`` entry
    has a full oracle (no rows-only checks; ann_lsh_buckets mirrors the
    quantized-SRP hash in SQL)."""
    return dict(ORACLE_SQL)
