"""Host parallel-scaling control for the scaling bench.

The N->4N efficiency criterion divides two throughputs measured on a
SHARED host whose own parallel capacity drifts session to session
(vCPU steal, frequency, memory-bandwidth neighbors).  This probe
measures the host's raw ceiling at the same effective thread counts the
pipeline uses (each local[N] slot chains a JVM task thread with an
Arrow-connected Python worker => ~2 active threads per slot), using a
fixed pure-numpy kernel in independent processes — no Spark, no I/O.

Report `pipeline_efficiency / host_ceiling` as the engine-attributable
scaling; the ceiling itself is environment.

Usage: python tools/host_scaling_probe.py [--low 4] [--high 16]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

WORK = """
import numpy as np, time
t0 = time.time()
a = np.random.default_rng(1).random(2_000_000)
for _ in range(300):
    b = np.sort(a); s = b[::2].sum()
print(time.time() - t0)
"""


def run(n: int) -> tuple[float, float]:
    t0 = time.time()
    ps = [subprocess.Popen([sys.executable, "-c", WORK],
                           stdout=subprocess.PIPE) for _ in range(n)]
    outs = [float(p.communicate()[0]) for p in ps]
    return time.time() - t0, sum(outs) / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    lows, highs = [], []
    for _ in range(args.reps):
        lows.append(run(args.low)[1])
        highs.append(run(args.high)[1])
    lo = sorted(lows)[len(lows) // 2]
    hi = sorted(highs)[len(highs) // 2]
    print(json.dumps({
        "low_procs": args.low, "high_procs": args.high,
        "per_proc_sec_low": round(lo, 2), "per_proc_sec_high": round(hi, 2),
        # same per-proc work at both levels: ceiling = slowdown factor
        "host_ceiling": round(lo / hi, 3),
    }))


if __name__ == "__main__":
    main()
