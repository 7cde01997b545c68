#!/usr/bin/env python
"""Plot per-stage timings emitted by the driver.

Modernizes the reference's scripts/performance.py (which plotted
duration_ns vs num_threads from a TSV that no longer exists,
performance.py:13-71).  Consumes the TSV written by
`dsrt_tpu.driver --timings_tsv` / utils/timing.py (stage, duration_ns,
index) and plots per-stage duration over frame index plus a summary bar.

Usage: python scripts/performance.py --tsv timings.tsv [--out perf.png]
"""

from __future__ import annotations

import argparse
import collections
import csv
import sys


def read_tsv(path: str):
    stages = collections.defaultdict(list)
    with open(path) as fh:
        for row in csv.DictReader(fh, delimiter="\t"):
            stages[row["stage"]].append(int(row["duration_ns"]) / 1e6)
    return stages


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True)
    p.add_argument("--out", default="performance.png")
    args = p.parse_args(argv)

    stages = read_tsv(args.tsv)
    if not stages:
        print("no records", file=sys.stderr)
        return 1

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        for name, ds in stages.items():
            print(f"{name}: n={len(ds)} total={sum(ds):.1f} ms "
                  f"mean={sum(ds)/len(ds):.1f} ms")
        return 0

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4.5))
    for name, ds in stages.items():
        ax1.plot(ds, marker=".", lw=1, label=name)
    ax1.set_xlabel("call index")
    ax1.set_ylabel("duration [ms]")
    ax1.set_title("per-stage durations")
    ax1.legend()

    names = list(stages)
    totals = [sum(stages[n]) for n in names]
    ax2.barh(names, totals)
    ax2.set_xlabel("total time [ms]")
    ax2.set_title("stage totals")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"[+] wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
