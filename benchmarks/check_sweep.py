#!/usr/bin/env python
"""Plausibility checker for committed sweep CSVs.

Round 4 committed rows with 0.00 ms elapsed and 262,144 GB/s bandwidth
(320x HBM peak) — the degenerate-slope clamp leaking into the artifact.
This checker is the commit gate: every row must be physically possible.

    python benchmarks/check_sweep.py benchmarks/results_v5e_r4.csv ...

Exit 0 iff every row of every file passes:
  * avg_time_ms > 0 and elapsed_time_ms > 0,
  * algo_bw_l2 and algo_bw_dram <= SAFETY x HBM peak
    (the l2 variant legitimately counts cached re-reads above DRAM
    bytes, but nothing can beat the wire by 25%),
  * the name carries no 'impossible' flag.

Pinned by tests/test_sweep_emitter.py.
"""

from __future__ import annotations

import csv
import sys

SAFETY = 1.25
DEFAULT_PEAK_GBPS = 819.0  # v5e; pass a different peak for other chips


def check_rows(reader, peak_gbps: float = DEFAULT_PEAK_GBPS):
    """Return a list of (line_no, problem) for implausible rows."""
    problems = []
    cap = SAFETY * peak_gbps
    for i, row in enumerate(reader, start=2):  # 1-based, after header
        name = row.get("name", "")
        if "impossible" in name:
            problems.append((i, f"row flagged {name!r}"))
            continue
        try:
            avg = float(row["avg_time_ms"])
            elapsed = float(row["elapsed_time_ms"])
            bw_l2 = float(row["algo_bw_l2"])
            bw_dram = float(row["algo_bw_dram"])
        except (KeyError, ValueError) as e:
            problems.append((i, f"unparseable row: {e}"))
            continue
        if avg <= 0.0 or elapsed <= 0.0:
            problems.append((i, f"non-positive time ({avg} ms)"))
        elif max(bw_l2, bw_dram) > cap:
            problems.append(
                (i, f"bandwidth {max(bw_l2, bw_dram):.2f} GB/s exceeds "
                    f"{SAFETY:.2f}x peak ({cap:.0f} GB/s)")
            )
    return problems


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 2
    rc = 0
    for path in argv[1:]:
        with open(path) as f:
            problems = check_rows(csv.DictReader(f))
        if problems:
            rc = 1
            for line_no, what in problems:
                print(f"{path}:{line_no}: {what}")
        else:
            print(f"{path}: OK")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv))
