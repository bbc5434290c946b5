#!/usr/bin/env python3
"""Host-condition probe: prints one CSV line

    <iso-time>,<cpu8_units>,<membw_MBps>

cpu8_units  — work completed by 8 register-bound LCG burn processes in 2 s
              (healthy baseline on this box: ~1350; blind to memory pressure).
membw_MBps  — single-thread 64 MB array-copy throughput, read+write
              (healthy baseline: ~10-15 GB/s; the dimension the engine's
              array-heavy phases live on — observed 7 MB/s..2.5 GB/s under
              co-tenant squeezes, BENCH.md §11).

Run before/after benchmarks; a run whose two probes disagree by >2x was
measured in a moving window and needs a best-of-N repeat.
"""
import multiprocessing as mp
import time
import array
import datetime


def _burn(_):
    t0 = time.time()
    x = 0
    cnt = 0
    while time.time() - t0 < 2.0:
        for _ in range(100000):
            x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
        cnt += 1
    return cnt


def cpu8():
    with mp.Pool(8) as p:
        return sum(p.map(_burn, range(8)))


def membw():
    a = array.array("d", [1.0]) * (8 * 1024 * 1024)  # 64 MB
    t0 = time.time()
    n = 0
    while time.time() - t0 < 2.0:
        _ = a[:]
        n += 1
    return round(n * 128 / (time.time() - t0))


if __name__ == "__main__":
    print(f"{datetime.datetime.now().isoformat(timespec='seconds')},{cpu8()},{membw()}")
