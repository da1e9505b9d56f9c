"""Result export (S10) — json / txt / csv dumps with common-field header.

Re-expresses libs/result_dump.py:16-43 Spark-first: the reference
iterates results in the webui process, intersecting result-dict keys to
pick the CSV header and streaming rows; here the intersection is ONE
distributed aggregation (key-count == row-count, the same A9 operator
the ``common_fields`` oracle query certifies) and the dumps are plain
``df.write`` jobs — no driver-side loop, so a 10^9-row result table
exports at cluster speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_result_fields(results: DataFrame) -> list[str]:
    """Keys present in EVERY row's ``result`` JSON (result_formater's
    ``common_fields`` intersection, libs/result_dump.py:16-43)."""
    n = results.count()
    if n == 0:
        return []
    keys = results.select(
        F.explode(F.expr("json_object_keys(result)")).alias("key")
    )
    per_key = keys.groupBy("key").agg(F.count("*").alias("n_with_key"))
    rows = per_key.filter(F.col("n_with_key") == n).select("key").collect()
    return sorted(r["key"] for r in rows)


def dump_as_json(results: DataFrame, path: str) -> None:
    """One JSON object per line (dump_as_json), written distributed."""
    results.select(
        F.to_json(
            F.struct(*[F.col(c) for c in results.columns])
        ).alias("value")
    ).write.mode("overwrite").text(path)


def dump_as_txt(results: DataFrame, path: str) -> None:
    """``url \\t result-json`` per line (dump_as_txt)."""
    results.select(
        F.concat_ws("\t", F.col("url"), F.col("result")).alias("value")
    ).write.mode("overwrite").text(path)


def dump_as_csv(results: DataFrame, path: str) -> None:
    """CSV whose columns are url + the common result fields + an
    ``others`` JSON column for the per-row leftovers (dump_as_csv +
    result_formater split)."""
    fields = common_result_fields(results)
    cols = [F.col("url")]
    for k in fields:
        # result keys that clash with the base columns get an r_ prefix
        alias = f"r_{k}" if k in ("url", "others") else k
        cols.append(F.get_json_object(F.col("result"), f"$.{k}").alias(alias))
    # leftovers: the full result minus the common fields, kept as JSON
    others = F.to_json(
        F.map_filter(
            F.from_json(F.col("result"), "map<string,string>"),
            lambda k, _v: ~k.isin(*[F.lit(f) for f in fields]) if fields else F.lit(True),
        )
    )
    cols.append(others.alias("others"))
    results.select(*cols).write.mode("overwrite").option("header", True).csv(path)
