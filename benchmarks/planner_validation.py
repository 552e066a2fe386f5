#!/usr/bin/env python
"""Validate the placement planner's decisions against chip measurements.

The planner (``cuembed_tpu/parallel/planner.py``) ranks placements from
a static cost model. This harness replays its decision for several table
mixes against *measured* per-chip step times, the way the reference
derives its launch heuristics from measurement
(``/root/reference/cuembed/include/embedding_lookup.cuh:186-208``).

Method (one attached chip — the box has no pod):

* For each mix and each feasible placement, build the PER-SHARD problem
  a chip would own at ``--n_shards`` (its table slice, its local batch,
  the replicated/all-gathered inputs the placement prescribes) and run
  the placement's REAL code path (the same shard_map wrappers
  ``planned_lookup``/``planned_sgd_update`` dispatch to) on a 1-device
  mesh. All-to-alls over a size-1 axis are identity, so the measured
  time is the placement's per-chip COMPUTE: gather + bucketing + sorts +
  capacity padding + update scatter.
* Add the planner's own ``comm_bytes_per_step`` estimate over a
  caller-set ICI rate (``--ici_gbps``; set it to your pod slice's
  measured all-to-all rate) to model the full step.
* Report, per mix: measured compute ms, comm MB, modeled total ms, the
  modeled winner, and whether ``plan()`` picked it.

What this validates: the compute side of the ranking (the part the cost
model does NOT measure) and the comm-bytes bookkeeping. What it cannot
validate here: actual ICI contention — that needs a pod.

    JAX_PLATFORMS=tpu python benchmarks/planner_validation.py \
        [--n_shards 8] [--ici_gbps 90] [--batch 65536] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _mixes(batch, scale=1):
    """(name, TableConfig kwargs, alpha, head_hit) — the 4 canonical mixes.

    ``scale`` divides the vocab sizes (CI smoke on CPU); measured numbers
    only mean something at scale=1 on the chip.
    """
    mixes = [
        # skewed traffic on a big table: hybrid's regime
        ("skewed-10Mx128", dict(num_categories=10_000_000, width=128,
                                hotness=32, dtype="bfloat16"), 1.15, 0.75),
        # uniform traffic, same shape: row-sharded's regime
        ("uniform-10Mx128", dict(num_categories=10_000_000, width=128,
                                 hotness=32, dtype="bfloat16"), 0.0, 0.0),
        # small + wide: column sharding's regime
        ("wide-512Kx512", dict(num_categories=512 * 1024, width=512,
                               hotness=16, dtype="float32"), 1.05, 0.0),
        # huge + wide: grid's regime
        ("huge-16Mx256", dict(num_categories=16_000_000, width=256,
                              hotness=64, dtype="bfloat16"), 1.05, 0.0),
    ]
    if scale > 1:
        mixes = [
            (nm, {**kw, "num_categories": max(4096, kw["num_categories"]
                                              // scale)}, a, h)
            for nm, kw, a, h in mixes
        ]
    return mixes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_shards", type=int, default=8,
                    help="pod size the plan is made for (measurement "
                    "simulates one of its chips)")
    ap.add_argument("--col_shards", type=int, default=2)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--ici_gbps", type=float, default=90.0,
                    help="effective per-chip ICI GB/s used to price "
                    "comm_bytes_per_step; calibrate from your pod")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--csv", type=str, default="")
    ap.add_argument("--mini", action="store_true",
                    help="64x-smaller vocabs + tiny batch: smoke/CI only")
    args = ap.parse_args()
    if args.mini:
        args.batch = min(args.batch, 2048)
        args.iters = min(args.iters, 4)

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from cuembed_tpu.collection import TableConfig
    from cuembed_tpu.parallel.alltoall_lookup import (
        alltoall_row_sharded_lookup,
        grid_sharded_lookup,
        hybrid_tiered_lookup,
        split_hybrid_table,
    )
    from cuembed_tpu.parallel.planner import (
        COLUMN_SHARDED,
        GRID_SHARDED,
        HYBRID,
        REPLICATED,
        ROW_SHARDED,
        CostModel,
        plan,
    )
    from cuembed_tpu.parallel.sharded_lookup import column_sharded_lookup
    from cuembed_tpu.parallel.train import (
        column_sharded_sgd_sparse_update,
        grid_sharded_sgd_sparse_update,
        sharded_hybrid_sgd_sparse_update,
        sharded_sgd_sparse_update,
    )
    from cuembed_tpu.train import sgd_sparse_update
    from cuembed_tpu.types import CombineMode
    from cuembed_tpu.utils.benchmarking import (
        bump_from, carry_probe, robust_chain_time,
    )
    from cuembed_tpu.utils.datagen import PowerLawGenerator

    n = args.n_shards
    dev = jax.devices()[0]
    mesh1 = Mesh(np.array([dev]).reshape(1), ("model",))
    mesh11 = Mesh(np.array([dev]).reshape(1, 1), ("model", "data"))
    cost = CostModel()
    rows_out = []

    def time_step(step, x0, *operands):
        """Per-step ms of a chained device step.

        Round-5 policy (docs/PERF_NOTES.md §timing): tables/grads enter
        as jit OPERANDS or as carried STATE, never closure captures (the
        round-4 version baked 2.6 GB of tables into every executable as
        constants — each compile re-uploaded them through the tunnel);
        outputs feed carry_probe (full-output sum-of-squares) so nothing
        is dead-code-eliminated; updated tables ride the carry, which
        both defeats memoization and measures the production
        donate-through regime.
        """
        return 1e3 * robust_chain_time(
            step, x0, operands=operands,
            k_lo=max(1, args.iters // 4), k_hi=args.iters, repeats=2,
        )

    scale = 64 if args.mini else 1
    for name, kw, alpha, hit in _mixes(args.batch, scale):
        cfg = TableConfig(name=name, **kw)
        V, W, H = cfg.num_categories, cfg.width, cfg.hotness
        dt = jnp.dtype(cfg.dtype)
        B = args.batch
        B_l = max(1, B // n)
        gen = PowerLawGenerator(V - 1, H, alpha, seed=11)
        idx_g = jnp.asarray(gen.sample(B).astype(np.int32))
        idx_l = idx_g[:B_l]
        key = jax.random.key(0)

        # the automatic decision for this mix at n shards
        p = plan(
            [cfg], n, batch=B, cost=cost,
            head_hit_rate={name: hit} if hit else None,
            column_ok=True, grid_ok=True, col_shards=args.col_shards,
        )
        auto_pick = p.tables[name].placement

        def comm_ms(placement):
            """Price plan()'s comm estimate for this placement."""
            p2 = _forced_comm(placement)
            return p2 / (args.ici_gbps * 1e9) * 1e3

        def _forced_comm(placement):
            # replay plan()'s own comm formulas (planner.py:255-345)
            elem = dt.itemsize
            pw = -(-W // 128) * 128
            total = V * pw * elem
            nnz = B * H
            nnz_l = -(-nnz // n)
            routed = int(nnz_l * cost.capacity_factor)
            row_comm = routed * (4 + W * elem + 4 + W * 4)
            if placement == REPLICATED:
                return nnz_l * (4 + W * 4) * (n - 1)
            if placement == ROW_SHARDED:
                return row_comm
            if placement == HYBRID:
                budget_rows = _hot_rows()
                head_bytes = budget_rows * pw * elem
                return int(row_comm * (1.0 - hit)) + head_bytes * 2
            if placement == COLUMN_SHARDED:
                return int(
                    (B * W * elem + nnz * (4 + W * 4)) * (n - 1) / n
                )
            if placement == GRID_SHARDED:
                w_s = W // args.col_shards
                return routed * (4 + w_s * elem + 4 + w_s * 4) + int(
                    (B // n) * W * elem
                    * (args.col_shards - 1) / args.col_shards
                )
            raise ValueError(placement)

        def _hot_rows():
            from cuembed_tpu.ops.tiered import DEFAULT_HOT_BYTES

            pw = -(-W // 128) * 128
            r = DEFAULT_HOT_BYTES // (pw * dt.itemsize) // 8 * 8
            return min(r, (V - 8 * n) // 8 * 8)

        # ---- feasible placements and their per-shard measured steps ----
        placements = {}

        # replicated: full table fits one chip? (HBM gate as plan() sees it)
        full_bytes = V * (-(-W // 128) * 128) * dt.itemsize
        if full_bytes <= cost.hbm_bytes * cost.hbm_budget_fraction:
            table = jax.random.normal(key, (V, W), dt)
            gy = jax.random.normal(key, (B, W), jnp.float32)

            @jax.jit
            def step_repl(c, t, gy, ixl, ixg):
                i, d = c
                ii = ixl + bump_from(d)
                out = t.at[ii].get(mode="promise_in_bounds").sum(axis=1)
                # update sees the ALL-GATHERED global COO. The update's
                # scatter cannot be partially dead-code-eliminated
                # through a slice probe (its indices are dynamic), so a
                # 4K-row probe keeps the full update honest without
                # carrying a second multi-GB table copy.
                t2 = sgd_sparse_update(
                    t, ixg + bump_from(d), gy, lr=0.01,
                    mode=CombineMode.SUM,
                )
                return (i + 1, carry_probe(out) + carry_probe(t2[:4096]))

            placements[REPLICATED] = time_step(
                step_repl, (jnp.int32(0), jnp.float32(0)),
                table, gy, idx_l, idx_g,
            )
            del table, gy

        # row_sharded: slice of V/n rows, local batch, degenerate a2a
        V_l = -(-V // n)
        t_l = jax.random.normal(key, (V_l, W), dt)
        gy_l = jax.random.normal(key, (B_l, W), jnp.float32)
        idx_shard = jnp.minimum(idx_l, V_l - 1)

        @jax.jit
        def step_row(c, t, gy_l_, ix_s):
            i, d = c
            ii = ix_s + bump_from(d)
            out = alltoall_row_sharded_lookup(
                t, ii, mesh=mesh1, capacity_factor=cost.capacity_factor,
            )
            t2 = sharded_sgd_sparse_update(
                t, ii, gy_l_, mesh=mesh1, lr=0.01,
                capacity_factor=cost.capacity_factor,
            )
            return (i + 1, carry_probe(out) + carry_probe(t2[:4096]))

        placements[ROW_SHARDED] = time_step(
            step_row, (jnp.int32(0), jnp.float32(0)),
            t_l, gy_l, idx_shard,
        )
        del t_l, gy_l

        # hybrid: replicated head + per-shard tail slice
        if hit:
            hot = _hot_rows()
            if 1024 <= hot < V:
                tail_l = -(-(V - hot) // n)
                head = jax.random.normal(key, (hot, W), dt)
                tail = jax.random.normal(key, (tail_l, W), dt)
                gy_l = jax.random.normal(key, (B_l, W), jnp.float32)

                @jax.jit
                def step_hyb(c, hd, tl, gy_l_, ixl):
                    i, d = c
                    ii = ixl + bump_from(d)
                    ii = jnp.minimum(ii, hot + tail_l - 1)
                    out = hybrid_tiered_lookup(
                        hd, tl, ii, mesh=mesh1,
                        capacity_factor=cost.capacity_factor,
                        cold_frac=max(0.05, 1.0 - hit),
                    )
                    h2, t2 = sharded_hybrid_sgd_sparse_update(
                        hd, tl, ii, gy_l_, mesh=mesh1, lr=0.01,
                        capacity_factor=cost.capacity_factor,
                        cold_frac=max(0.05, 1.0 - hit),
                    )
                    # h2 (dense head math) probes in FULL — a slice
                    # probe would let XLA narrow the head matmul; t2
                    # (dynamic scatter) is slice-probe safe.
                    return (i + 1, carry_probe(out) + carry_probe(h2)
                            + carry_probe(t2[:4096]))

                placements[HYBRID] = time_step(
                    step_hyb, (jnp.int32(0), jnp.float32(0)),
                    head, tail, gy_l, idx_l,
                )
                del head, tail, gy_l

        # column_sharded: width slice W/n, sees the GLOBAL batch
        if (
            V <= cost.column_rows_max
            and W >= 128 * n
            and W % n == 0
        ):
            t_c = jax.random.normal(key, (V, W // n), dt)
            gy_g = jax.random.normal(key, (B, W // n), jnp.float32)

            @jax.jit
            def step_col(c, t, gy_g_, ixg):
                i, d = c
                ii = ixg + bump_from(d)
                out = column_sharded_lookup(
                    t, ii, mesh=mesh11, model_axis="model",
                    gather_output=False,
                )
                t2 = column_sharded_sgd_sparse_update(
                    t, ii, gy_g_, mesh=mesh11, lr=0.01,
                    model_axis="model",
                )
                return (i + 1, carry_probe(out) + carry_probe(t2[:4096]))

            placements[COLUMN_SHARDED] = time_step(
                step_col, (jnp.int32(0), jnp.float32(0)),
                t_c, gy_g, idx_g,
            )
            del t_c, gy_g

        # grid: rows V/(n/c) x width W/c per chip at (n_r = n/c, n_c = c)
        c_sh = args.col_shards
        if W % c_sh == 0 and W >= 128 * c_sh and n % c_sh == 0:
            n_r = n // c_sh
            V_g = -(-V // n_r)
            t_g = jax.random.normal(key, (V_g, W // c_sh), dt)
            B_r = max(1, B // n_r)
            gy_r = jax.random.normal(key, (B_r, W // c_sh), jnp.float32)
            idx_r = jnp.minimum(idx_g[:B_r], V_g - 1)

            @jax.jit
            def step_grid(c, t, gy_r_, ix_r):
                i, d = c
                ii = ix_r + bump_from(d)
                out = grid_sharded_lookup(
                    t, ii, mesh=mesh11,
                    capacity_factor=cost.capacity_factor,
                    row_axis="model", col_axis="data",
                    gather_output=False,
                )
                t2 = grid_sharded_sgd_sparse_update(
                    t, ii, gy_r_, mesh=mesh11, lr=0.01,
                    capacity_factor=cost.capacity_factor,
                    row_axis="model", col_axis="data",
                )
                return (i + 1, carry_probe(out) + carry_probe(t2[:4096]))

            placements[GRID_SHARDED] = time_step(
                step_grid, (jnp.int32(0), jnp.float32(0)),
                t_g, gy_r, idx_r,
            )
            del t_g, gy_r

        # ---- model the full step and rank -------------------------------
        total = {
            pl: ms + comm_ms(pl) for pl, ms in placements.items()
        }
        winner = min(total, key=total.get)
        print(f"\n== {name} (alpha={alpha}, hit={hit}) — plan() picked "
              f"{auto_pick} ==")
        for pl in sorted(total, key=total.get):
            mark = " <== plan()" if pl == auto_pick else ""
            print(f"  {pl:<15} compute {placements[pl]:8.2f} ms + comm "
                  f"{comm_ms(pl):7.2f} ms = {total[pl]:8.2f} ms{mark}")
            rows_out.append(
                (name, alpha, hit, pl, placements[pl], comm_ms(pl),
                 total[pl], pl == auto_pick, pl == winner)
            )
        verdict = ("OK" if winner == auto_pick else
                   f"MISS by {total[auto_pick] / total[winner]:.2f}x")
        print(f"  modeled winner: {winner} — {verdict}")

    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["mix", "alpha", "head_hit", "placement",
                        "compute_ms", "comm_ms", "total_ms",
                        "plan_pick", "modeled_winner"])
            w.writerows(rows_out)
        print(f"\nwrote {args.csv}")


if __name__ == "__main__":
    main()
