"""Structured Streaming form of the scheduler counters (SURVEY §2.9/A6).

The reference's counters are wall-clock ring buffers fed record-at-a-time
(``pyspider/libs/counter.py:104-258``, wired at ``scheduler.py:190-205``
and ``tornado_fetcher.py:751-767``).  The batch engine computes them as
tumbling-window aggregations per epoch (``queries.q_windowed_counters``);
this module is the *continuous* form: ``readStream`` → event-time window
aggregation with a watermark → sink, so the same counter semantics run
unmodified as a long-lived streaming job on a cluster.

Design notes for scale:

- the aggregation state is keyed by (window, event_type) — bounded by
  the watermark horizon, so state store size is O(windows retained ×
  key cardinality), independent of input volume;
- ``availableNow`` trigger gives deterministic catch-up batch runs (the
  test harness and backfill path); a production deployment swaps the
  trigger for a processing-time one and the memory sink for an
  Iceberg/parquet sink — the dataflow is identical;
- ``stream_running_counts`` shows the arbitrary-stateful path
  (``applyInPandasWithState``) the engine would use for operators the
  built-in window aggregation cannot express (e.g. the reference's
  project pause/unpause streak machine, scheduler.py:52-103).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def stream_windowed_counters(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "counters_stream",
) -> DataFrame:
    """Tumbling-window event counters over a file stream.

    Reads ``events_dir`` (a directory of parquet files with the events
    schema) as a stream, aggregates count + sum(value) per
    (window, event_type), runs one ``availableNow`` catch-up pass into
    an in-memory sink, and returns the result table.

    Matches the batch oracle::

        SELECT date_trunc('hour', ts), event_type,
               count(*), round(sum(value), 2) FROM events GROUP BY 1, 2
    """
    schema = spark.read.parquet(events_dir).schema
    src = spark.readStream.schema(schema).parquet(events_dir)
    # event-time columns must be TIMESTAMP (tz-aware); parquet NTZ -> cast
    # (session tz is UTC, so wall values are preserved)
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


# reference libs/counter.py:104-258 — every counter reports these
# retention windows; '_all_' uses elapsed-since-first-event as the
# averaging base (TimebaseAverageWindowCounter semantics)
COUNTER_TIERS = {"5m": 300, "1h": 3600, "1d": 86400, "all": None}


def counter_tiers(
    events: DataFrame,
    now: float,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiers: dict | None = None,
) -> DataFrame:
    """Tiered counter view (A6 extension; libs/counter.py:104-258
    CounterManager.__getitem__ exposes 5m/1h/1d/all per counter, each
    with ``sum`` and ``avg`` = sum/elapsed).

    ONE aggregation pass computes per-tier conditional sums/counts
    (``ts >= now - secs``), then a single explode unpivots to
    ``(key, tier, n_events, sum_value, avg_per_sec)`` — no re-scan per
    tier, no join.  ``ts_col`` is epoch seconds (double).
    """
    tiers = tiers or COUNTER_TIERS
    aggs = []
    for name, secs in tiers.items():
        cond = (
            F.lit(True)
            if secs is None
            else (F.col(ts_col) >= F.lit(float(now - secs)))
        )
        aggs.append(
            F.coalesce(F.sum(F.when(cond, F.col(value_col))), F.lit(0.0)).alias(
                f"_s_{name}"
            )
        )
        aggs.append(F.count(F.when(cond, F.lit(1))).alias(f"_n_{name}"))
    aggs.append(F.min(ts_col).alias("_min_ts"))
    g = events.groupBy(key_col).agg(*aggs)
    rows = []
    for name, secs in tiers.items():
        elapsed = (
            F.lit(float(secs))
            if secs is not None
            else F.greatest(F.lit(float(now)) - F.col("_min_ts"), F.lit(1.0))
        )
        rows.append(
            F.struct(
                F.lit(name).alias("tier"),
                F.col(f"_n_{name}").alias("n_events"),
                F.round(F.col(f"_s_{name}"), 2).alias("sum_value"),
                F.round(F.col(f"_s_{name}") / elapsed, 6).alias("avg_per_sec"),
            )
        )
    return g.select(key_col, F.explode(F.array(*rows)).alias("_t")).select(
        key_col,
        F.col("_t.tier").alias("tier"),
        F.col("_t.n_events").alias("n_events"),
        F.col("_t.sum_value").alias("sum_value"),
        F.col("_t.avg_per_sec").alias("avg_per_sec"),
    )


_RUN_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
    ]
)
_RUN_STATE = StructType([StructField("n", LongType())])


def _running_count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"event_type": [key[0]], "n_events": [n]})


def stream_running_counts(
    spark: SparkSession,
    events_dir: str,
    query_name: str = "running_counts_stream",
) -> DataFrame:
    """Arbitrary-stateful running totals per event_type via
    ``applyInPandasWithState`` — the custom-stateful-operator template
    (counter 'all' window; also the shape for the pause-streak machine).
    """
    schema = spark.read.parquet(events_dir).schema
    src = spark.readStream.schema(schema).parquet(events_dir)
    out = src.groupBy("event_type").applyInPandasWithState(
        _running_count_fn,
        outputStructType=_RUN_OUT,
        stateStructType=_RUN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode sink may hold several emissions per key; latest wins
    t = spark.table(query_name)
    return t.groupBy("event_type").agg(F.max("n_events").alias("n_events"))
