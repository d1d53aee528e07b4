"""Host-contention spin probe for the scaling protocol (BASELINE.md).

Prints the ratio of 32-way-concurrent to single-process wall time for a
fixed pure-Python spin: ~1.0 on an idle 32-CPU host, >>1 when co-tenants
hold physical cores.  The scaling campaign fires `bench.py --scaling`
only when the ratio is near 1 and records the probe value with each run,
bracketing how much of any efficiency shortfall is the host's.

Usage: python scripts/hostprobe.py [nprocs]
"""
import sys
import time
import multiprocessing as mp

SPIN_N = 3_000_000
BW_MB = 64


def spin(n: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i * i
    return time.time() - t0


def stream(mb: int) -> float:
    """Memory-bandwidth leg: sum a working set far larger than L3 —
    co-tenant bandwidth pressure shows here when the in-cache spin
    reads idle (observed on the 2026-08-18 campaign)."""
    import numpy as np
    a = np.ones((mb << 20) // 8)
    t0 = time.time()
    for _ in range(3):
        a.sum()
    return time.time() - t0


def ratio(nprocs: int = 32) -> float:
    t1 = min(spin(SPIN_N) for _ in range(2))
    with mp.Pool(nprocs) as p:
        t0 = time.time()
        p.map(spin, [SPIN_N] * nprocs)
        twide = time.time() - t0
    return twide / t1


def bw_ratio(nprocs: int = 16) -> float:
    t1 = min(stream(BW_MB) for _ in range(2))
    with mp.Pool(nprocs) as p:
        p.map(stream, [8] * nprocs)       # warm the pool + allocators
        t0 = time.time()
        p.map(stream, [BW_MB] * nprocs)
        twide = time.time() - t0
    return twide / t1                     # wall vs 1-proc time


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    r = ratio(n)
    b = bw_ratio()
    print(f"{{\"nprocs\": {n}, \"ratio\": {r:.3f}, "
          f"\"bw_ratio\": {b:.3f}}}")
    sys.exit(0 if r <= 1.6 and b <= 8.0 else 1)
