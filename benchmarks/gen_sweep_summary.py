#!/usr/bin/env python
"""Regenerate the docs/SWEEP_SUMMARY.md table from a sweep results CSV.

Mechanical transformation of ``sweep_runner.py`` output (the reference
CSV schema, ``manual_benchmark.cu:263-299``) into the summary's markdown
table + per-(width, alpha) geomean aggregates, so the committed summary
can never drift from the committed data. Unstable points (flagged ``!``
by the runner's outlier policy) carry the flag into the table.

Usage:
    python benchmarks/gen_sweep_summary.py benchmarks/results_v5e_r3.csv
"""

from __future__ import annotations

import csv
import math
import sys
from collections import defaultdict


def fmt_cats(v: int) -> str:
    return f"{v // 1_000_000}M" if v % 1_000_000 == 0 else str(v)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/results_v5e.csv"
    rows = defaultdict(dict)  # config key -> stage -> (ms, bw_l2, flag)
    order = []
    with open(path) as f:
        for r in csv.DictReader(f):
            key = (
                int(r["num_categories"]), int(r["embed_width"]),
                int(r["batch_size"]), int(r["hotness"]),
                float(r["alpha"]), int(r["is_csr"]),
            )
            name = r["name"]
            flag = "!" if name.endswith("!") else ""
            stage = name.rstrip("!")
            if key not in rows:
                order.append(key)
            rows[key][stage] = (
                float(r["avg_time_ms"]), float(r["algo_bw_l2"]), flag,
            )

    print("| cats | W | batch | hot | alpha | fwd ms | fwd GB/s | tr ms "
          "| bwd ms | bwd GB/s |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    geo = defaultdict(list)
    for key in order:
        V, W, B, H, alpha, is_csr = key
        st = rows[key]
        fwd = st.get("forward")
        tr = st.get("transpose")
        bwd = st.get("backward")

        def cell(s, i, nd=2):
            return f"{s[i]:.{nd}f}{s[2]}" if s else "—"

        hot = f"csr~{H}" if is_csr else str(H)
        print(f"| {fmt_cats(V)} | {W} | {B} | {hot} | {alpha:g} "
              f"| {cell(fwd, 0)} | {cell(fwd, 1, 1)} | {cell(tr, 0)} "
              f"| {cell(bwd, 0)} | {cell(bwd, 1, 1)} |")
        if fwd and not is_csr:
            geo[(W, alpha)].append(fwd[1])

    print()
    print("## Aggregates (geomean forward app-BW by slice)")
    print()
    print("| W | alpha | geomean fwd GB/s | points |")
    print("|---|---|---|---|")
    for (W, alpha) in sorted(geo):
        vals = [v for v in geo[(W, alpha)] if v > 0]
        g = math.exp(sum(math.log(v) for v in vals) / len(vals)) if vals else 0
        print(f"| {W} | {alpha:g} | {g:.1f} | {len(geo[(W, alpha)])} |")


if __name__ == "__main__":
    main()
