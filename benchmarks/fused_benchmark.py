#!/usr/bin/env python
"""Fused multi-table groups vs per-table dispatches (A/B).

Two regimes, because the answer is regime-dependent (round-5 finding —
the old single-point version compared 26 VMEM-resident tables against
one HBM-resident fused table and concluded fusing "loses"):

* **dispatch-bound**: many small tables whose union still fits VMEM.
  Fusing replaces T gather dispatches with one; both sides gather at
  VMEM rate, so the delta is pure dispatch/launch overhead.
* **HBM-bound, calibrated**: big tables (each > VMEM). Per-table
  lookups pay descriptor-rate HBM gathers; the fused table is
  frequency-ordered across the whole group (``fuse_counts``) and served
  by the tiered engine — the hot head now spans ALL tables' hot rows,
  which no per-table layout can express.

Measurement policy: robust_chain_time + carry_probe (full-output
dependencies), operands-not-closures — docs/PERF_NOTES.md §timing.

Usage: python benchmarks/fused_benchmark.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--tables", type=int, default=None)
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--hotness", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuembed_tpu import (
        embedding_lookup,
        fuse_counts,
        fuse_tables,
        fused_lookup,
        fused_sgd_update,
        sgd_sparse_update,
    )
    from cuembed_tpu.ops.tiered import auto_config
    from cuembed_tpu.utils.benchmarking import (
        bump_from, carry_probe, robust_chain_time,
    )
    from cuembed_tpu.utils.calibration import refine_tiered_config
    from cuembed_tpu.utils.datagen import PowerLawGenerator
    from cuembed_tpu.utils.frequency import (
        count_frequencies,
        frequency_order,
    )

    x0 = (jnp.int32(0), jnp.float32(0))

    def timed(step, *ops, iters=4):
        st = robust_chain_time(step, x0, operands=ops, k_lo=1,
                               k_hi=iters, repeats=3, return_stats=True)
        return st["median"]

    def run_regime(label, T, V, W, B, H, alpha, calibrated):
        rng = np.random.default_rng(0)
        names = [f"t{i}" for i in range(T)]
        np_tables = {
            n: rng.standard_normal((V, W)).astype(np.float32)
            for n in names
        }
        tables = {n: jnp.asarray(np_tables[n]) for n in names}
        hot = {n: H for n in names}
        if alpha > 0:
            gen = PowerLawGenerator(V - 1, H, alpha, seed=3, permute=True)
            idx_np = {n: gen.sample(B).astype(np.int32) for n in names}
        else:
            idx_np = {
                n: rng.integers(0, V, (B, H)).astype(np.int32)
                for n in names
            }
        gys = [
            jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
            for _ in names
        ]

        idx_list = [jnp.asarray(idx_np[n]) for n in names]
        tabs = [tables[n] for n in names]

        @jax.jit
        def step_separate(carry, *ops):
            i, dep = carry
            tabs_, idxs = ops[:T], ops[T:]
            acc = jnp.float32(0)
            for t, ix in zip(tabs_, idxs):
                out = embedding_lookup(t, ix + bump_from(dep),
                                       backend="xla")
                acc = acc + carry_probe(out)
            return (i + 1, acc)

        from functools import partial

        @partial(jax.jit, static_argnames=("tiered_",))
        def step_fused(carry, fused_a, remap_a, *idxs, tiered_=None):
            i, dep = carry
            shifted = {
                n: ix + bump_from(dep) for n, ix in zip(names, idxs)
            }
            out = fused_lookup(
                fused_a, spec, shifted, remap=remap_a,
                backend="tiered" if tiered_ is not None else "xla",
                tiered_cfg=tiered_,
            )
            acc = jnp.float32(0)
            for o in out.values():
                acc = acc + carry_probe(o)
            return (i + 1, acc)

        def fused_ops(c, f, r, *ix):
            return step_fused(
                c, f, r if remap_dev is not None else None, *ix,
                tiered_=tiered,
            )

        t_sep = timed(step_separate, *tabs, *idx_list)

        @jax.jit
        def upd_separate(carry, *ops):
            i, dep = carry
            tabs_, idxs = ops[:T], ops[T:]
            acc = jnp.float32(0)
            for t, ix, g in zip(tabs_, idxs, gys):
                nt = sgd_sparse_update(
                    t, ix + bump_from(dep), g, lr=0.01
                )
                acc = acc + carry_probe(nt[:8])
            return (i + 1, acc)

        @partial(jax.jit, static_argnames=("tiered_",))
        def upd_fused(carry, fused_a, remap_a, *idxs, tiered_=None):
            i, dep = carry
            shifted = {
                n: ix + bump_from(dep) for n, ix in zip(names, idxs)
            }
            gd = {n: g for n, g in zip(names, gys)}
            nt = fused_sgd_update(fused_a, spec, shifted, gd, lr=0.01,
                                  remap=remap_a, tiered_cfg=tiered_)
            return (i + 1, carry_probe(nt[:8]))

        def upd_fused_ops(c, f, r, *ix):
            return upd_fused(
                c, f, r if remap_dev is not None else None, *ix,
                tiered_=tiered,
            )

        u_sep = timed(upd_separate, *tabs, *idx_list)

        # ---- fused side: free the per-table device copies FIRST,
        # then build the (optionally frequency-reordered) fused table on
        # the HOST and upload once — the device cannot hold separate
        # tables + fused + a reorder copy at this scale.
        import numpy as _np

        from cuembed_tpu.fused import FusedSpec

        _, spec = fuse_tables(
            {n: jnp.zeros((V, 1), jnp.float32) for n in names},
            hot,
        )
        spec = FusedSpec(
            names=spec.names, bases=spec.bases, sizes=spec.sizes,
            hotness=spec.hotness, width=W,
            total_rows=spec.total_rows,
        )
        tables.clear()
        del tabs
        fused_np = _np.concatenate(
            [np_tables[n] for n in names], axis=0
        )
        np_tables.clear()
        tiered, remap_dev = None, None
        if calibrated:
            # Group-wide frequency order: counts observed per table,
            # fused into one layout (the production calibration flow) —
            # the hot head spans ALL tables' hot rows.
            counts = {
                n: count_frequencies(idx_np[n], V) for n in names
            }
            fc = fuse_counts(spec, counts)
            order, remap = frequency_order(fc)
            fused_np = fused_np[order]
            remap_dev = jnp.asarray(remap)
            cfg0 = auto_config(spec.total_rows, W, 4, H)
            if cfg0 is not None:
                base = dict(zip(spec.names, spec.bases))
                flat = np.concatenate([
                    remap[idx_np[n].reshape(-1) + base[n]]
                    for n in names
                ])
                tiered = refine_tiered_config(
                    cfg0, flat, capacity_margin=1.12
                )
        fused_t = jax.block_until_ready(jnp.asarray(fused_np))
        del fused_np
        rm = (remap_dev if remap_dev is not None
              else jnp.zeros((0,), jnp.int32))

        if calibrated:
            # Production fused flow: the id -> physical-row remap lives
            # in the input pipeline (host), so the device step is ONE
            # tiered lookup / ONE sparse update over the whole group.
            # (fused_lookup's remap= option is the device-side variant;
            # it costs a 1-wide gather per position — measured ~3 ms at
            # 524K positions here — that production does not pay.)
            base = dict(zip(spec.names, spec.bases))
            phys = np.stack(
                [remap[idx_np[n] + base[n]] for n in names], axis=1
            )  # [B, T, H] physical rows
            idx_fused = jnp.asarray(
                phys.reshape(B * T, H).astype(np.int32)
            )
            gy_stack = jnp.asarray(
                np.stack([np.asarray(g) for g in gys], axis=1)
                .reshape(B * T, W)
            )

            @partial(jax.jit, static_argnames=("tiered_",))
            def step_fused_prod(carry, f, ix, tiered_=None):
                i, dep = carry
                out = embedding_lookup(
                    f, ix + bump_from(dep), backend="tiered",
                    tiered_cfg=tiered_,
                )
                return (i + 1, carry_probe(out))

            @partial(jax.jit, static_argnames=("tiered_",))
            def upd_fused_prod(carry, f, ix, gy, tiered_=None):
                i, dep = carry
                nt = sgd_sparse_update(
                    f, ix + bump_from(dep), gy, lr=0.01,
                    tiered_cfg=tiered_,
                )
                return (i + 1, carry_probe(nt[:8]))

            t_fus = timed(
                lambda c, f, ix: step_fused_prod(c, f, ix,
                                                 tiered_=tiered),
                fused_t, idx_fused,
            )
            u_fus = timed(
                lambda c, f, ix, g: upd_fused_prod(c, f, ix, g,
                                                   tiered_=tiered),
                fused_t, idx_fused, gy_stack,
            )
            print(
                f"{label} fwd  {T}x[{V}x{W}] B={B} H={H} a={alpha}: "
                f"separate {t_sep * 1e3:8.3f} ms  fused(tiered, host "
                f"remap) {t_fus * 1e3:8.3f} ms  "
                f"({t_sep / t_fus:.2f}x)",
                flush=True,
            )
            print(
                f"{label} sgd  {T}x[{V}x{W}] B={B} H={H} a={alpha}: "
                f"separate {u_sep * 1e3:8.3f} ms  fused(tiered, host "
                f"remap) {u_fus * 1e3:8.3f} ms  "
                f"({u_sep / u_fus:.2f}x)",
                flush=True,
            )
            return

        t_fus = timed(fused_ops, fused_t, rm, *idx_list)
        print(
            f"{label} fwd  {T}x[{V}x{W}] B={B} H={H} a={alpha}: "
            f"separate {t_sep * 1e3:8.3f} ms  fused "
            f"{t_fus * 1e3:8.3f} ms  ({t_sep / t_fus:.2f}x)",
            flush=True,
        )
        u_fus = timed(upd_fused_ops, fused_t, rm, *idx_list)
        print(
            f"{label} sgd  {T}x[{V}x{W}] B={B} H={H} a={alpha}: "
            f"separate {u_sep * 1e3:8.3f} ms  fused "
            f"{u_fus * 1e3:8.3f} ms  ({u_sep / u_fus:.2f}x)",
            flush=True,
        )

    if args.quick:
        run_regime(
            "vmem ",
            args.tables or 8, args.rows or 8_000, args.width or 64,
            args.batch or 1024, args.hotness or 4, 0.0,
            calibrated=False,
        )
    else:
        # dispatch-bound: 26 x 2 MB tables, fused 53 MB (still VMEM)
        run_regime("vmem ", 26, 8_192, 64, 8192, 8, 0.0,
                   calibrated=False)
        # HBM-bound: 8 x 512 MB tables (width 128 — the tiered
        # engine's native lane width; narrow widths need packed storage
        # and their own harness); fused 4.1 GB + group-wide frequency
        # order + tiered engine (reorder runs on the host so the device
        # never holds two copies)
        run_regime("hbm  ", 8, 1_000_000, 128, 8192, 8, 1.05,
                   calibrated=True)


if __name__ == "__main__":
    main()
