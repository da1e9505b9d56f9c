"""N-vs-4N scaling evidence (BASELINE.json north_rule).

The sandbox has no real cluster, so the rule's two-cluster-size
criterion is evidenced by running the SAME crawl job on the SAME input
at two parallelism levels — ``local[8]`` (N) and ``local[32]`` (4N) —
and reporting throughput at both plus the scaling efficiency

    efficiency = (throughput@4N / throughput@N) / 4 .

Measurement protocol — PAIRED ALTERNATING runs.  This VM
burst-throttles sustained all-core load with large, slowly-varying
swings (identical back-to-back runs were measured 71 s vs 179 s), so
independent best-of-N per level compares two different machine states
and the ratio is garbage.  Instead each *pair* runs both levels
back-to-back (one fresh process/JVM each, equal cooldown before each
run) so the two legs see near-identical host state; the pair order
alternates (4N→N, N→4N, 4N→N) so monotone throttle drift helps one leg
in half the pairs and the other leg in the rest; the headline is the
MEDIAN of the per-pair efficiencies.

Writes ``BENCH/scaling.json`` and ``BENCH/BASELINE.md``.

Usage: ``python tools/scaling_bench.py [sf_dir]`` (default sf0.1).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LO, HI = 8, 32
EPOCHS = 3
# pair orders: first-listed level runs first within the pair
PAIR_ORDERS = ((HI, LO), (LO, HI), (HI, LO))
COOLDOWN_SEC = 90


def run_once(cpus: int, sf_dir: str) -> dict:
    """One parallelism level in a FRESH process/JVM (no heap/GC/cache
    state carried between levels)."""
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_MODE="crawl",
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    for d in ("/dev/shm/spark_graft_local", "/dev/shm/spark_graft_wh"):
        shutil.rmtree(d, ignore_errors=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_pages = max(int(sf * 10_000_000), 2000)  # same sizing as bench.py
    n_hosts = max(n_pages // 100, 16)

    pairs = []
    for order in PAIR_ORDERS:
        pair: dict = {"order": list(order)}
        for cpus in order:
            time.sleep(COOLDOWN_SEC)
            pair[str(cpus)] = run_once(cpus, sf_dir)
        thr_lo = pair[str(LO)]["throughput_urls_per_sec"]
        thr_hi = pair[str(HI)]["throughput_urls_per_sec"]
        pair["efficiency"] = round((thr_hi / thr_lo) / (HI / LO), 3) if thr_lo else 0.0
        pairs.append(pair)
        print(
            f"pair {order}: {thr_lo:.0f} @ {LO} / {thr_hi:.0f} @ {HI}"
            f" -> eff {pair['efficiency']}",
            file=sys.stderr,
        )

    effs = sorted(p["efficiency"] for p in pairs)
    eff = effs[len(effs) // 2]  # median
    best = {
        c: max(pairs, key=lambda p: p[str(c)]["throughput_urls_per_sec"])[str(c)]
        for c in (LO, HI)
    }
    thr = {c: best[c]["throughput_urls_per_sec"] for c in (LO, HI)}

    # Machine envelope (tools/cpu_ceiling.py, committed next to this
    # file's output): the VM's OWN aggregate-compute step from N to 4N
    # pure-CPU processes.  The dataflow cannot scale past the machine;
    # eff_dataflow = median_pair_eff / (cpu@4N/cpu@N / 4) isolates the
    # plan's parallelizability from host CPU throttling.
    ceiling = None
    eff_dataflow = None
    ceil_path = f"{REPO}/BENCH/cpu_ceiling.json"
    if os.path.exists(ceil_path):
        with open(ceil_path) as f:
            ceiling = json.load(f)
        lo_k, hi_k = str(LO), str(HI)
        if lo_k in ceiling and hi_k in ceiling:
            cpu_ratio = (
                ceiling[hi_k]["best_ops_per_sec"] / ceiling[lo_k]["best_ops_per_sec"]
            )
            if cpu_ratio > 0:
                eff_dataflow = round(eff / (cpu_ratio / (HI / LO)), 3)

    out = {
        "sf_dir": sf_dir,
        "n_pages": n_pages,
        "n_hosts": n_hosts,
        "epochs": EPOCHS,
        "protocol": "paired-alternating, median of per-pair efficiencies",
        "pairs": [
            {
                "order": p["order"],
                "efficiency": p["efficiency"],
                str(LO): {
                    "throughput_urls_per_sec": round(
                        p[str(LO)]["throughput_urls_per_sec"], 1
                    ),
                    "elapsed_sec": round(p[str(LO)]["elapsed_sec"], 2),
                    "epoch_secs": p[str(LO)].get("epoch_secs"),
                },
                str(HI): {
                    "throughput_urls_per_sec": round(
                        p[str(HI)]["throughput_urls_per_sec"], 1
                    ),
                    "elapsed_sec": round(p[str(HI)]["elapsed_sec"], 2),
                    "epoch_secs": p[str(HI)].get("epoch_secs"),
                },
            }
            for p in pairs
        ],
        "levels": {
            str(c): {
                "throughput_urls_per_sec": round(thr[c], 1),
                "elapsed_sec": round(best[c]["elapsed_sec"], 2),
                "urls_scheduled_deduped": best[c]["urls_scheduled_deduped"],
                "epoch_secs": best[c].get("epoch_secs"),
                "epoch_metrics": best[c].get("epoch_metrics"),
            }
            for c in (LO, HI)
        },
        "pair_efficiencies": effs,
        "scaling_efficiency": round(eff, 3),
        "cpu_ceiling": ceiling,
        "scaling_efficiency_vs_cpu_ceiling": eff_dataflow,
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/scaling.json", "w") as f:
        json.dump(out, f, indent=2)

    pair_rows = "\n".join(
        f"| {i + 1} | {p['order'][0]}→{p['order'][1]} "
        f"| {p[str(LO)]['throughput_urls_per_sec']:.0f} "
        f"| {p[str(HI)]['throughput_urls_per_sec']:.0f} "
        f"| {p['efficiency']} |"
        for i, p in enumerate(pairs)
    )
    md = f"""# BENCH/BASELINE.md — frontier throughput + scaling efficiency

Metric (BASELINE.json): **frontier throughput (URLs scheduled+deduped/sec)**
with **scaling efficiency ≥ 0.8 between N and 4N** parallelism.  The
sandbox has no multi-node cluster, so N vs 4N executors is evidenced by
`local[{LO}]` vs `local[{HI}]` on one machine (same job, same input, same
seed list + politeness budget; deterministic synthetic Common-Crawl-style
world, {n_pages} pages × ~20 KB / {n_hosts} Zipf-skewed hosts, {EPOCHS}
epochs, wide-open politeness so throughput is engine-bound, untimed
warmup run per process, each run in a fresh process/JVM).  Shuffle and
snapshot storage sit on tmpfs for this measurement: a single box has ONE
~500 MB/s disk shared by all cores — a serial resource that a real
cluster scales linearly with node count — so leaving it on disk would
measure the sandbox's disk, not the dataflow.

## Protocol: paired alternating runs

This VM burst-throttles sustained all-core load with large slow swings
(identical back-to-back runs measured 71 s vs 179 s), so per-level
best-of-N compares two different machine states.  Each *pair* runs both
levels back-to-back (equal cooldown first), so both legs see
near-identical host state; pair order alternates so throttle drift
helps each level in half the pairs; the headline is the **median of the
per-pair efficiencies**.

| pair | order | urls/s @ local[{LO}] | urls/s @ local[{HI}] | efficiency |
|---|---|---|---|---|
{pair_rows}

**Scaling efficiency (median of pairs) = {out['scaling_efficiency']}**

Best observed throughput: **{thr[LO]:.0f} urls/s @ local[{LO}]**,
**{thr[HI]:.0f} urls/s @ local[{HI}]** (details in `scaling.json`).
"""
    if eff_dataflow is not None:
        lo_k, hi_k = str(LO), str(HI)
        md += f"""
**Ceiling-normalized efficiency = {eff_dataflow}** — the machine's own
pure-CPU envelope (`BENCH/cpu_ceiling.json`, best-of identical
busy-loop processes, no Spark) delivers only
{round(ceiling[hi_k]['best_ops_per_sec'] / ceiling[lo_k]['best_ops_per_sec'], 2)}×
aggregate compute from {lo_k} to {hi_k} processes (ideal
{HI // LO}×): this sandbox VM burst-throttles sustained
all-core load, so no dataflow can show a 4× step here.
`eff_dataflow = median_pair_eff / (cpu@4N/cpu@N / 4)` divides out that
host ceiling and is the number comparable to the rule's multi-executor
intent (each cluster node brings its OWN cpu budget).
"""
    md += f"""

Caveats: single-JVM local mode shares one driver and one shuffle
service, so this measures the dataflow's parallelizability (no
single-partition stages, balanced partitions), not network shuffle cost.
The per-epoch fixed cost (JVM job scheduling, snapshot commit) is
amortized over the epoch batch; at cluster scale the same plan shape
shards by `host_bucket`/`hash(taskid)` across executors (see
operators/frontier.py docstrings).

Reference point: the reference's own harness (`pyspider bench`) is a
single-process Python loop whose scheduler is bounded by
LOOP_LIMIT=1000 tasks per 0.1 s loop (≤ ~10k selects/s upper bound,
`pyspider/scheduler/scheduler.py:150-151`) and in-practice throughput is
reported in pages/min over live HTTP; this engine's per-URL scheduling
cost at local[{HI}] is measured above on the same semantic work
(canonicalize → dedup → politeness-ranked select → robots gate → fetch
join → extract → status fold → snapshot commit).

Generated by `python tools/scaling_bench.py {sf_dir}`.
"""
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
