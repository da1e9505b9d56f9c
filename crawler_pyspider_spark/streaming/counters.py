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
