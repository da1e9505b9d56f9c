"""robots.txt gating as a broadcast-joined rules table (F8/J6).

The reference keeps a per-netloc ``urllib.robotparser`` cache with a 1 h
TTL and calls ``can_fetch(ua, url)`` before every HTTP fetch
(``pyspider/fetcher/tornado_fetcher.py:81,303-338,377-382``).  Set-at-a-
time this becomes:

- a small per-host rules table ``(host, disallow_prefixes:array<string>,
  fetched_ts)`` — the parsed form of robots.txt; TTL = how often the
  rules table is re-snapshotted (an epoch parameter, not a per-row
  clock);
- a **broadcast hash join** on ``host`` (rules are dim-sized and
  skew-free) + a JVM-side ``exists()`` prefix predicate — no Python in
  the hot path.

``parse_robots_txt`` turns raw robots.txt bodies into that rules table
with longest-prefix-wins robotparser semantics reduced to the
disallow-prefix subset (sufficient for the engine's gating contract;
full Allow/Disallow precedence can be layered in the same shape).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def robots_gate(tasks: DataFrame, robots: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``robots_allowed:boolean``.

    A URL is denied when any disallow prefix matches its path.  Unknown
    hosts (no rules row) are allowed — same as the reference's
    robotparser default when robots.txt is absent (404 -> allow all).
    """
    rules = F.broadcast(robots.select("host", "disallow_prefixes"))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    denied = F.exists(
        F.col("disallow_prefixes"), lambda p: path.startswith(p)
    )
    return (
        tasks.join(rules, "host", "left")
        .withColumn(
            "robots_allowed",
            F.when(F.col("disallow_prefixes").isNull(), F.lit(True)).otherwise(~denied),
        )
        .drop("disallow_prefixes")
    )


@F.pandas_udf(ArrayType(StringType()))
def disallow_prefixes_of(robots_txt: pd.Series) -> pd.Series:
    """Parse raw robots.txt bodies -> disallow prefixes for ``*`` agents.

    Vectorized (Arrow batch); one pass per body.  Mirrors what
    ``urllib.robotparser`` would answer for a generic UA on
    Disallow-only rule files.
    """

    def parse(txt: str) -> list[str]:
        if not txt:
            return []
        prefixes, applies = [], False
        for line in txt.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                applies = val == "*"
            elif key == "disallow" and applies and val:
                prefixes.append(val)
        return prefixes

    return robots_txt.map(parse, na_action="ignore")
