"""robots.txt gating as a broadcast-joined rules table (F8/J6).

The reference keeps a per-netloc ``urllib.robotparser`` cache with a 1 h
TTL and calls ``can_fetch(ua, url)`` before every HTTP fetch
(``pyspider/fetcher/tornado_fetcher.py:81,303-338,377-382``).  Set-at-a-
time this becomes:

- a small per-host rules table — the parsed form of robots.txt; TTL =
  how often the rules table is re-snapshotted (an epoch parameter, not a
  per-row clock);
- a **broadcast hash join** on ``host`` (rules are dim-sized and
  skew-free) + a JVM-side predicate over the parsed rule array — no
  Python in the hot path.

Two rule-table schemas are supported by ``robots_gate``:

- ``rules: array<struct<path,allow>>`` — FULL ``urllib.robotparser``
  semantics: per-UA group selection happens at parse time
  (``robots_rules_udf``), and the gate replays ``Entry.allowance``:
  rules are checked in FILE ORDER and the FIRST match wins (Allow and
  Disallow both participate; CPython's robotparser is first-match, not
  longest-match).  Unknown hosts and no-match URLs are allowed.
- ``disallow_prefixes: array<string>`` — the legacy Disallow-only
  subset (kept for the synthetic world and bench paths, where rule
  files are Disallow-only and both semantics agree).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

# ordered rule list of the UA's entry — RuleLine(path, allowance) pairs
ROBOTS_RULES_TYPE = ArrayType(
    StructType(
        [
            StructField("path", StringType()),
            StructField("allow", BooleanType()),
        ]
    )
)


def _match_key(url_col):
    """The string the gate matches rules against: raw path[?query].

    robotparser compares ``quote(unquote(url path?query))`` against
    ``quote(unquote(rule path))`` (parse() unquotes the rule value,
    RuleLine re-quotes it; can_fetch does the same to the URL) — both
    sides end up in the same canonical quoted form, and since quote()
    maps each character to a fixed token, ``quote(a).startswith(
    quote(b)) ⟺ a.startswith(b)``.  Comparing the UNQUOTED forms is
    therefore exactly equivalent, and needs no percent-encoder in the
    JVM expression.  (``robots_rules_udf`` stores unquoted rule paths;
    URLs containing %XX escapes would need an unquote here — the
    engine's canonicalized URLs don't.)"""
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit("/"))
    query = F.parse_url(url_col, F.lit("QUERY"))
    return F.when(query.isNotNull(), F.concat(path, F.lit("?"), query)).otherwise(
        F.when(path == "", F.lit("/")).otherwise(path)
    )


def robots_gate(tasks: DataFrame, robots: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``robots_allowed:boolean``.

    Unknown hosts (no rules row) are allowed — same as the reference's
    robotparser default when robots.txt is absent (404 -> allow all).
    """
    if "rules" in robots.columns:
        rules = F.broadcast(robots.select("host", "rules"))
        key = _match_key(F.col(url_col))
        # Entry.allowance: first rule (file order) whose path matches
        # decides; no match -> allow.  F.filter preserves array order,
        # so element_at(..., 1) is the first match.
        # try_element_at: NULL (not ANSI error) when no rule matches.
        # No '*'-wildcard branch: RuleLine.applies_to's `path == "*"`
        # check is dead code for parsed files (parse() quotes '*' to
        # '%2A' before it's stored), so prefix match is the whole rule.
        first = F.try_element_at(
            F.filter(
                F.col("rules"),
                lambda r: key.startswith(r["path"]),
            ),
            F.lit(1),
        )
        allowed = (
            F.when(F.col("rules").isNull(), F.lit(True))
            .when(first.isNull(), F.lit(True))
            .otherwise(first["allow"])
        )
        return (
            tasks.join(rules, "host", "left")
            .withColumn("robots_allowed", allowed)
            .drop("rules")
        )
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


def robots_rules_udf(user_agent: str = "*"):
    """Pandas-UDF factory: raw robots.txt body -> the ordered rule list
    of the entry ``urllib.robotparser`` would consult for ``user_agent``
    (per-UA group selection + '*' default entry + RuleLine path quoting,
    tornado_fetcher.py:303-338 uses exactly this parser).  Parsing
    delegates to the stdlib parser itself, so group selection, empty-
    Disallow ("allow all") handling, and path quoting are parity by
    construction; the gate then replays ``Entry.allowance`` JVM-side."""

    @F.pandas_udf(ROBOTS_RULES_TYPE)
    def _udf(robots_txt: pd.Series) -> pd.Series:
        from urllib.robotparser import RobotFileParser

        def parse(txt: str):
            rp = RobotFileParser()
            rp.parse(txt.splitlines() if txt else [])
            entry = next(
                (e for e in rp.entries if e.applies_to(user_agent)), None
            )
            if entry is None:
                entry = rp.default_entry
            if entry is None:
                return []
            # store UNQUOTED canonical paths — see _match_key for why
            # this is exactly robotparser's quoted comparison
            from urllib.parse import unquote

            return [
                {"path": unquote(rl.path), "allow": bool(rl.allowance)}
                for rl in entry.rulelines
            ]

        return robots_txt.map(parse, na_action="ignore")

    return _udf


@F.pandas_udf(ArrayType(StringType()))
def disallow_prefixes_of(robots_txt: pd.Series) -> pd.Series:
    """Parse raw robots.txt bodies -> disallow prefixes for ``*`` agents.

    Vectorized (Arrow batch); one pass per body.  Mirrors what
    ``urllib.robotparser`` would answer for a generic UA on
    Disallow-only rule files.  (Legacy subset — ``robots_rules_udf``
    is the full-precedence path.)
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
