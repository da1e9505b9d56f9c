"""Host CPU-quota calibration for the scaling evidence.

This sandbox VM burst-throttles sustained all-core load: the SAME
binary measured 68k/131k/68k urls/s across back-to-back 32-thread runs
while 8-thread runs held steady, and per-core throughput falls
monotonically with thread count (2→38k/core·2, 8→8.9k, 32→4.1k).  That
means the machine itself cannot deliver 4× the aggregate compute at 4N
threads — no dataflow, however parallel, can show a 4× throughput step.

This tool measures that hardware envelope WITHOUT Spark: K worker
processes run an identical pure-CPU busy loop for a fixed wall time;
aggregate iterations/sec at N vs 4N processes is the machine's own
scaling ceiling.  The honest dataflow efficiency is then

    eff_dataflow = (thr@4N / thr@N) / (cpu@4N / cpu@N)

reported alongside the raw (thr@4N / thr@N) / 4 in BENCH/scaling.json.

Usage: python tools/cpu_ceiling.py [N] [4N] [seconds]  (default 8 32 8)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

COOLDOWN = 45
REPS = 3


def _burn(q, seconds: float) -> None:
    end = time.monotonic() + seconds
    x = 1
    n = 0
    while time.monotonic() < end:
        for _ in range(10_000):
            x = (x * 1103515245 + 12345) % (1 << 31)
        n += 10_000
    q.put(n + (x & 1))  # consume x so the loop can't be elided


def measure_once(nproc: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q, seconds)) for _ in range(nproc)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def measure(nproc: int, seconds: float) -> dict:
    runs = []
    for _ in range(REPS):
        time.sleep(COOLDOWN)
        runs.append(measure_once(nproc, seconds))
    return {"best_ops_per_sec": max(runs), "all": [round(r) for r in runs]}


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    out = {
        str(lo): measure(lo, seconds),
        str(hi): measure(hi, seconds),
    }
    out["ratio"] = round(
        out[str(hi)]["best_ops_per_sec"] / out[str(lo)]["best_ops_per_sec"], 3
    )
    out["ideal_ratio"] = hi / lo
    print(json.dumps(out))


if __name__ == "__main__":
    main()
