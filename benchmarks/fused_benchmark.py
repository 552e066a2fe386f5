#!/usr/bin/env python
"""Fused multi-table group vs per-table lookups/updates.

The DLRM-like regime: many small same-width tables (default 26 x 100K x
64, the classic Criteo shape). Measures, chained on-device:

  * forward: T separate ``embedding_lookup`` calls vs ONE
    ``fused_lookup`` of the stacked table,
  * train: T separate sparse SGD updates vs ONE ``fused_sgd_update``.

Fusion's win is dispatch + gather-descriptor amortization; the moved
bytes are identical. Run on the chip:

    python benchmarks/fused_benchmark.py [--quick]
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
        fuse_tables,
        fused_lookup,
        fused_sgd_update,
        sgd_sparse_update,
    )
    from cuembed_tpu.utils.benchmarking import chain_time

    if args.quick:
        T, V, W, B, H = 8, 10_000, 64, 1024, 4
    else:
        T, V, W, B, H = 26, 100_000, 64, 8192, 8
    T = args.tables or T
    V = args.rows or V
    W = args.width or W
    B = args.batch or B
    H = args.hotness or H

    rng = np.random.default_rng(0)
    names = [f"t{i}" for i in range(T)]
    tables = {
        n: jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
        for n in names
    }
    hot = {n: H for n in names}
    idx = {
        n: jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
        for n in names
    }
    gys = {
        n: jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
        for n in names
    }
    fused, spec = fuse_tables(tables, hot)
    fused = jax.block_until_ready(fused)
    idx_list = [idx[n] for n in names]
    gy_list = [gys[n] for n in names]

    # ---- forward ---------------------------------------------------------
    @jax.jit
    def step_separate(tabs, idxs, carry):
        i, dep = carry
        acc = dep
        for t, ix in zip(tabs, idxs):
            out = embedding_lookup(
                t, ix + (dep * 0).astype(jnp.int32), backend="xla"
            )
            acc = acc + out[0, 0].astype(jnp.float32)
        return (i + 1, acc)

    tabs = [tables[n] for n in names]

    @jax.jit
    def step_fused(fused, idxs, carry):
        i, dep = carry
        shifted = {
            n: ix + (dep * 0).astype(jnp.int32)
            for n, ix in zip(names, idxs)
        }
        out = fused_lookup(fused, spec, shifted, backend="xla")
        acc = dep
        for o in out.values():
            acc = acc + o[0, 0].astype(jnp.float32)
        return (i + 1, acc)

    t_sep = chain_time(
        lambda c: step_separate(tabs, idx_list, c),
        (jnp.int32(0), jnp.float32(0)), k_lo=1, k_hi=4, repeats=3,
    )
    t_fus = chain_time(
        lambda c: step_fused(fused, idx_list, c),
        (jnp.int32(0), jnp.float32(0)), k_lo=1, k_hi=4, repeats=3,
    )
    print(
        f"forward  {T}x[{V}x{W}] B={B} H={H}: separate "
        f"{t_sep * 1e3:8.3f} ms  fused {t_fus * 1e3:8.3f} ms  "
        f"({t_sep / t_fus:.2f}x)"
    )

    # ---- sparse SGD ------------------------------------------------------
    @jax.jit
    def upd_separate(tabs, idxs, gy, carry):
        i, dep = carry
        acc = dep
        for t, ix, g in zip(tabs, idxs, gy):
            nt = sgd_sparse_update(
                t, ix + (dep * 0).astype(jnp.int32), g, lr=0.01
            )
            acc = acc + nt[0, 0].astype(jnp.float32)
        return (i + 1, acc)

    @jax.jit
    def upd_fused(fused, idxs, carry):
        i, dep = carry
        shifted = {
            n: ix + (dep * 0).astype(jnp.int32)
            for n, ix in zip(names, idxs)
        }
        nt = fused_sgd_update(fused, spec, shifted, gys, lr=0.01)
        return (i + 1, nt[0, 0].astype(jnp.float32))

    u_sep = chain_time(
        lambda c: upd_separate(tabs, idx_list, gy_list, c),
        (jnp.int32(0), jnp.float32(0)), k_lo=1, k_hi=4, repeats=3,
    )
    u_fus = chain_time(
        lambda c: upd_fused(fused, idx_list, c),
        (jnp.int32(0), jnp.float32(0)), k_lo=1, k_hi=4, repeats=3,
    )
    print(
        f"sgd      {T}x[{V}x{W}] B={B} H={H}: separate "
        f"{u_sep * 1e3:8.3f} ms  fused {u_fus * 1e3:8.3f} ms  "
        f"({u_sep / u_fus:.2f}x)"
    )


if __name__ == "__main__":
    main()
