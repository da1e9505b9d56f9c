"""Full robots.txt Allow/Disallow precedence + per-UA groups (F8/J6).

The reference gates every fetch through ``urllib.robotparser.
RobotFileParser.can_fetch`` (tornado_fetcher.py:303-338,377-382); the
operator parses each body with the SAME stdlib parser
(``robots_rules_udf``) and replays ``Entry.allowance`` as a JVM
first-match predicate (``robots_gate`` rules path).  These tests assert
byte-parity against ``can_fetch`` itself.
"""

from urllib.robotparser import RobotFileParser

import pytest
from pyspark.sql import functions as F

from crawler_pyspider_spark.operators.robots import robots_gate, robots_rules_udf

ROBOTS = {
    # Allow overrides a broader Disallow when it comes FIRST (file order
    # wins in robotparser — first matching rule decides)
    "a.test": "User-agent: *\nAllow: /public/\nDisallow: /\n",
    # Disallow first: the Allow below it never fires for /private/...
    "b.test": "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n",
    # per-UA group: spiderbot gets its own (stricter) group; others
    # fall through to the * group
    "c.test": (
        "User-agent: spiderbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /tmp/\n"
    ),
    # empty Disallow = allow all (robotparser RuleLine special case)
    "d.test": "User-agent: *\nDisallow:\n",
    # no * group at all: unknown UA is unrestricted
    "e.test": "User-agent: otherbot\nDisallow: /\n",
    # query strings participate in matching (quoted to %3F on both
    # sides by robotparser)
    "f.test": "User-agent: *\nDisallow: /search%3Fq=\n",
}

PATHS = [
    "/", "/public/x", "/private/ok/page", "/private/other", "/tmp/x",
    "/page", "/search?q=foo", "/search", "/public", "/publicx",
]


def _expected(ua: str):
    out = {}
    for host, txt in ROBOTS.items():
        rp = RobotFileParser()
        rp.parse(txt.splitlines())
        for p in PATHS:
            url = f"http://{host}{p}"
            out[url] = rp.can_fetch(ua, url)
    return out


@pytest.mark.parametrize("ua", ["*", "spiderbot", "mozilla"])
def test_gate_matches_robotparser(spark, ua):
    rules = spark.createDataFrame(
        list(ROBOTS.items()), "host string, robots_txt string"
    ).select("host", robots_rules_udf(ua)(F.col("robots_txt")).alias("rules"))
    tasks = spark.createDataFrame(
        [(h, f"http://{h}{p}") for h in ROBOTS for p in PATHS],
        "host string, url string",
    )
    got = {
        r["url"]: r["robots_allowed"]
        for r in robots_gate(tasks, rules).collect()
    }
    exp = _expected(ua)
    diffs = {u: (got[u], exp[u]) for u in exp if got[u] != exp[u]}
    assert not diffs, f"gate vs robotparser mismatches ({ua}): {diffs}"


def test_unknown_host_allowed(spark):
    rules = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    ).select("host", robots_rules_udf("*")(F.col("robots_txt")).alias("rules"))
    tasks = spark.createDataFrame(
        [("zzz.test", "http://zzz.test/x"), ("a.test", "http://a.test/x")],
        "host string, url string",
    )
    got = {r["host"]: r["robots_allowed"] for r in robots_gate(tasks, rules).collect()}
    assert got == {"zzz.test": True, "a.test": False}
