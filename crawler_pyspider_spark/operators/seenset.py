"""Partitioned bloom-filter URL-seen set (the 10^10-scale dedup tier).

The reference answers "have we seen this URL?" with a per-project sqlite
point lookup (``database/sqlite/taskdb.py:72-85``) fronted by an
in-memory queue-membership dict (``scheduler/task_queue.py:281-286``) —
neither survives 10^10 URLs.  Set-at-a-time, the membership check is the
*pre-filter* in front of the frontier MERGE join (SURVEY.md §4): novel
URLs skip the expensive join entirely; only bloom-positive ("possibly
seen") URLs continue to the exact new-vs-old decision join.  False
positives therefore cost an extra join probe, never correctness.

Layout — hash-partitioned shards, persisted as ordinary rows:

    shard    int      pmod(xxhash64(taskid), n_shards)
    bitmap   binary   m/8 bytes, m a power of two
    n_items  long     inserts so far (per-shard lineage counter)

Probe+insert runs as ONE ``cogroup().applyInPandas`` pass: incoming
URLs are shuffled to their shard (the same int-key shuffle the frontier
merge needs anyway), each task gets (its URL group, its one bitmap row),
sets k bits per URL via vectorized numpy, and emits the URL rows with a
``seen`` flag plus the updated bitmap row.  No driver state, no
collect; shard state lives in the epoch snapshot like every other
table, so resume restores the filter exactly.

Hashes are computed JVM-side (``F.xxhash64``) — Python only ever sees
two int64 columns per row.  Double hashing gives the k probe positions:
``pos_i = (h1 + i·h2) mod m`` (Kirsch-Mitzenmacher), all arithmetic in
uint64 with power-of-two m.

Sizing at 10^10 URLs: k=7, m_total = 10^11 bits (~12.5 GB) gives
~0.8 % FP; with n_shards = 2^14 each shard bitmap is ~780 KB — far
under an Arrow batch, thousands of shards per executor.  The defaults
here are test-scale (2^20 bits × 64 shards).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DEFAULT_SHARDS = 64
DEFAULT_BITS = 1 << 20  # per shard
DEFAULT_K = 7

SHARD_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("bitmap", BinaryType()),
        StructField("n_items", LongType()),
    ]
)


def empty_shards(spark: SparkSession, n_shards: int = DEFAULT_SHARDS, bits: int = DEFAULT_BITS) -> DataFrame:
    """All-zero bitmaps for every shard (generated distributed, not on
    the driver — at production sizing the empty filter is gigabytes)."""
    nbytes = bits // 8

    def gen(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        zeros = bytes(nbytes)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "shard": pdf["id"].astype("int32"),
                    "bitmap": [zeros] * len(pdf),
                    "n_items": np.zeros(len(pdf), dtype="int64"),
                }
            )

    return spark.range(n_shards).mapInPandas(gen, SHARD_SCHEMA)


def with_hashes(df: DataFrame, key_col: str = "taskid", n_shards: int = DEFAULT_SHARDS) -> DataFrame:
    """Append JVM-computed hash columns: _h1, _h2 (int64), shard."""
    h1 = F.xxhash64(F.col(key_col))
    h2 = F.xxhash64(F.concat(F.col(key_col), F.lit("#2")))
    return (
        df.withColumn("_h1", h1)
        .withColumn("_h2", h2)
        .withColumn("shard", F.pmod(h1, F.lit(n_shards)).cast("int"))
    )


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) probe positions, uint64 double hashing, m power of two."""
    u1 = h1.astype(np.int64).view(np.uint64)[:, None]
    u2 = h2.astype(np.int64).view(np.uint64)[:, None]
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((u1 + i * u2) & np.uint64(m - 1)).astype(np.int64)


def probe_combined(
    urls: DataFrame,
    shards: DataFrame,
    key_col: str = "taskid",
    n_shards: int = DEFAULT_SHARDS,
    bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """One-pass membership probe + insert.

    Returns ONE combined frame (cache it, then ``split()``) holding
    both row kinds:

    - ``flagged`` = the url rows with a ``seen:boolean`` column
      (seen=True ⇒ *possibly* seen before — route to the exact join;
      seen=False ⇒ *definitely* novel — safe to insert directly);
      every input row is also inserted, so a second occurrence of the
      same key in a later batch reports seen=True.
    - ``new_shards`` = the updated bitmap rows (every shard emitted,
      touched or not, so the snapshot stays complete).

    Within one batch, duplicate keys in the SAME pandas group are
    probed in row order against the live bitmap, so intra-batch dups
    after the first report seen=True — same semantics as the
    reference's sequential queue-membership check.
    """
    urls_h = with_hashes(urls, key_col, n_shards)
    # force nullability: shard rows carry NULL in every payload column,
    # even ones the source schema marks non-nullable (lit() columns)
    out_fields = [
        StructField(f.name, f.dataType, True)
        for f in urls_h.schema.fields
        if f.name not in ("_h1", "_h2")
    ]
    out_schema = StructType(
        out_fields
        + [
            StructField("seen", BooleanType()),
            StructField("bitmap", BinaryType()),
            StructField("n_items", LongType()),
        ]
    )
    payload_cols = [f.name for f in out_fields]
    nbytes = bits // 8

    def fn(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(right):
            bm = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8).copy()
            n_items = int(right["n_items"].iloc[0])
        else:  # shard row missing (fresh filter without empty_shards)
            bm = np.zeros(nbytes, dtype=np.uint8)
            n_items = 0
        rows = []
        if len(left):
            h1 = left["_h1"].to_numpy()
            h2 = left["_h2"].to_numpy()
            # dedup keys within the batch (row order preserved): the
            # first occurrence probes the bitmap, later dups are seen
            keys = np.stack([h1, h2], axis=1)
            _, first_idx = np.unique(keys, axis=0, return_index=True)
            pos = _positions(h1[first_idx], h2[first_idx], k, bits)
            byte_idx = pos >> 3
            bit_mask = (1 << (pos & 7)).astype(np.uint8)
            # vectorized probe: key present iff all k bits set
            present = ((bm[byte_idx] & bit_mask) == bit_mask).all(axis=1)
            # vectorized insert of the novel keys
            novel = ~present
            if novel.any():
                np.bitwise_or.at(
                    bm, byte_idx[novel].ravel(), bit_mask[novel].ravel()
                )
                n_items += int(novel.sum())
            seen_flags = np.ones(len(left), dtype=bool)
            seen_flags[first_idx[novel]] = False
            url_out = left[payload_cols].copy()
            url_out["seen"] = seen_flags
            url_out["bitmap"] = None
            url_out["n_items"] = None
            rows.append(url_out)
        shard_row = {c: [None] for c in payload_cols}
        shard_row["shard"] = [key[0]]
        shard_row["seen"] = [None]
        shard_row["bitmap"] = [bm.tobytes()]
        shard_row["n_items"] = [n_items]
        rows.append(pd.DataFrame(shard_row))
        return pd.concat(rows, ignore_index=True)

    return (
        urls_h.groupby("shard")
        .cogroup(shards.groupby("shard"))
        .applyInPandas(fn, out_schema)
    )


def split(combined: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a ``probe_combined`` frame into (flagged urls, new shards)."""
    flagged = combined.filter(F.col("seen").isNotNull()).drop("bitmap", "n_items")
    new_shards = combined.filter(F.col("bitmap").isNotNull()).select(
        "shard", "bitmap", "n_items"
    )
    return flagged, new_shards


def probe_and_insert(
    urls: DataFrame,
    shards: DataFrame,
    key_col: str = "taskid",
    n_shards: int = DEFAULT_SHARDS,
    bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> tuple[DataFrame, DataFrame]:
    """Convenience wrapper: ``split(probe_combined(...))`` (callers that
    consume both outputs should cache the combined frame instead)."""
    return split(probe_combined(urls, shards, key_col, n_shards, bits, k))


def fp_rate(n_items: int, bits: int = DEFAULT_BITS, k: int = DEFAULT_K) -> float:
    """Expected false-positive probability for a shard at fill n_items."""
    return (1.0 - np.exp(-k * n_items / bits)) ** k
