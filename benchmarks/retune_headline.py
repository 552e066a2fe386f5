#!/usr/bin/env python
"""On-chip retune of the tiered engine's static knobs at the flagship.

``auto_config`` hard-codes ``mxu_head_rows = min(128, hot_rows)`` and
sizes ``hot_rows`` from the measured 108 MB VMEM-placement budget; the
compare-reduce cube cost of a bigger MXU head (256/512 rows) vs the
per-row descriptors it saves has never been measured, and the int8 head
(~2x rows/VMEM-byte) shifts the mid/cold class boundary. This harness
builds the flagship table ONCE and chain-times ``tiered_forward`` over
the knob grid in-process (one 5 GB on-device table build instead of one
per point), the way the reference derives launch heuristics from
measurement (``embedding_lookup.cuh:186-208``).

    JAX_PLATFORMS=tpu python benchmarks/retune_headline.py \
        [--quick] [--csv out.csv]

Grid: mxu_head_rows {0, 128, 256, 512} x head {exact-bf16, int8};
per-variant slot capacities recalibrated on the measured batch. Prints
GB/s per point (reference forward-BW formula) and the winning config.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1M-row fp32 reduced config")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-runnable plumbing check (forces a "
                         "small hot-head budget so tiering engages)")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--csv", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from cuembed_tpu.ops.quant import int8_head_rows, quantize_head
    from cuembed_tpu.ops.tiered import tiered_forward
    from cuembed_tpu.types import CombineMode
    from cuembed_tpu.utils.benchmarking import (
        bump_from,
        chain_time,
        detect_hbm_peak_gbps,
        forward_app_bytes,
        carry_probe,
    )
    from cuembed_tpu.utils.calibration import calibrate_powerlaw_workload
    from cuembed_tpu.utils.frequency import calibrate_capacities

    hot_bytes = None
    if args.smoke:
        # > the 108 MB VMEM-serving budget so auto_config engages tiering
        V, B, H, W, alpha, dtype = 400_000, 512, 8, 128, 1.15, jnp.float32
        hot_bytes = 2 * 1024 * 1024
        args.iters = min(args.iters, 2)
    elif args.quick:
        V, B, H, W, alpha, dtype = 1_000_000, 8192, 32, 256, 1.15, jnp.float32
    else:
        V, B, H, W, alpha, dtype = (
            10_000_000, 65_536, 64, 256, 1.15, jnp.bfloat16
        )
    elem = jnp.dtype(dtype).itemsize

    @jax.jit
    def make_table():
        parts = [
            jax.random.uniform(
                jax.random.key(i), (V // 8, W), jnp.float32, -1, 1
            ).astype(dtype)
            for i in range(8)
        ]
        return jnp.concatenate(parts, axis=0)

    V = (V // 8) * 8
    table = jax.block_until_ready(make_table())

    cfg0, idx_rm, _ = calibrate_powerlaw_workload(
        V, B, H, alpha, W, elem, permute=True, seed=7,
        capacity_margin=1.05, hot_bytes=hot_bytes,
    )
    if cfg0 is None:
        raise SystemExit("table fits VMEM; nothing to retune")
    idx = jnp.asarray(idx_rm)
    app = forward_app_bytes(batch=B, hotness=H, width=W, elem_bytes=elem,
                            mode=CombineMode.SUM)
    peak = detect_hbm_peak_gbps()

    def time_cfg(cfg, q_head):
        # Output pinned via optimization_barrier (benchmarking.carry_probe): a bare scalar
        # probe is DCE-able and would flatter the measurement.
        @jax.jit
        def step(table, idx, carry):
            i, dep = carry
            ii = idx + bump_from(dep)
            out = tiered_forward(
                table, ii, None, None, mode=CombineMode.SUM, cfg=cfg,
                q_head=q_head,
            )
            return (i + 1, carry_probe(out))

        wrapped = lambda c: step(table, idx, c)
        st = chain_time(
            wrapped, (jnp.int32(0), jnp.float32(0)),
            k_lo=max(1, args.iters // 4), k_hi=args.iters, repeats=2,
            return_stats=True,
        )
        return st["min"]

    rows = []
    q_rows_budget = int8_head_rows(W, cfg0.hot_rows * W * elem)
    print(f"# flagship retune: V={V} B={B} H={H} W={W} alpha={alpha} "
          f"{jnp.dtype(dtype)}; exact hot_rows={cfg0.hot_rows} "
          f"int8 budget rows={q_rows_budget}; HBM peak {peak:.0f} GB/s",
          file=sys.stderr)

    grids = []
    for mxu in (0, 128, 256, 512):
        grids.append(("exact", mxu, cfg0.hot_rows, None))
    for mxu in (128, 256, 512):  # int8 head needs the 3-tier path (mxu>0)
        grids.append(("int8", mxu, min(V // 8 * 8, q_rows_budget), "q"))

    q_cache = {}
    for head_kind, mxu, hot_rows, q_flag in grids:
        if mxu >= hot_rows:
            continue
        mid_s, cold_s = calibrate_capacities(
            idx_rm, None, mxu, hot_rows, cfg0.chunk_elems, margin=1.1,
        )
        cfg = replace(
            cfg0, mxu_head_rows=mxu, hot_rows=hot_rows,
            mid_slots=mid_s, cold_slots=cold_s,
        )
        q_head = None
        if q_flag:
            if hot_rows not in q_cache:
                q_cache[hot_rows] = jax.block_until_ready(
                    quantize_head(table[:hot_rows])
                )
            q_head = q_cache[hot_rows]
        try:
            dt = time_cfg(cfg, q_head)
        except Exception as e:  # OOM / lowering failure: record and go on
            print(f"{head_kind:>5} mxu={mxu:<4} hot={hot_rows:<8} "
                  f"FAILED: {type(e).__name__}: {str(e)[:80]}")
            continue
        gbps = app / dt / 1e9
        print(f"{head_kind:>5} mxu={mxu:<4} hot={hot_rows:<8} "
              f"mid/cold {mid_s}/{cold_s}  {dt * 1e3:7.2f} ms  "
              f"{gbps:7.2f} GB/s ({gbps / peak * 100:4.1f}% peak)")
        rows.append((head_kind, mxu, hot_rows, mid_s, cold_s,
                     round(dt * 1e3, 3), round(gbps, 2)))

    if rows:
        best = min(rows, key=lambda r: r[5])
        print(f"# best: {best[0]} mxu={best[1]} hot={best[2]} "
              f"-> {best[6]} GB/s", file=sys.stderr)
    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["head", "mxu_head_rows", "hot_rows", "mid_slots",
                        "cold_slots", "time_ms", "gbps"])
            w.writerows(rows)
        print(f"wrote {args.csv}", file=sys.stderr)


if __name__ == "__main__":
    main()
