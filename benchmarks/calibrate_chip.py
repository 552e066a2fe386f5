#!/usr/bin/env python
"""Measure the chip constants record (cuembed_tpu.utils.chip).

Runs the three microbenches whose results gate dispatch decisions and
writes the raw record to ``cuembed_tpu/data/chip_constants_<kind>.json``
(committed so the constants ship with the package):

  1. row-gather rate vs source-operand size (VMEM placement boundary),
  2. narrow line-pack relayout throughput,
  3. tiered-vs-XLA A/B over the (positions, hotness) grid on a >VMEM
     table (the batch-shape law).

Usage: python benchmarks/calibrate_chip.py [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuembed_tpu.ops.api import embedding_lookup
    from cuembed_tpu.ops.narrow import pack_narrow
    from cuembed_tpu.types import CombineMode
    from cuembed_tpu.utils.benchmarking import (
        bump_from, carry_probe, robust_chain_time,
    )
    from cuembed_tpu.utils.calibration import calibrate_powerlaw_workload
    from cuembed_tpu.utils.chip import derive_chip_constants

    kind = jax.devices()[0].device_kind.lower()
    record = {"device_kind": kind}
    rng = np.random.default_rng(0)
    x0 = (jnp.int32(0), jnp.float32(0))

    def timed(step, *ops, iters=6):
        st = robust_chain_time(step, x0, operands=ops, k_lo=1,
                               k_hi=iters, repeats=3, return_stats=True)
        return st["median"]

    # ---- 1. gather rate vs operand size ---------------------------------
    W = 256
    NIDX = 1 << 21
    sizes = [4, 16, 48, 96, 112, 144] if not args.quick else [4, 48, 144]
    vmem = []
    for mb in sizes:
        rows = mb * 1024 * 1024 // (W * 4)
        src = jnp.asarray(
            rng.standard_normal((rows, W)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, rows, size=(NIDX,), dtype=np.int32))

        @jax.jit
        def g(carry, src, idx):
            i, dep = carry
            ii = (idx + bump_from(dep)) % src.shape[0]
            r = src.at[ii].get(mode="promise_in_bounds")
            return (i + 1, carry_probe(r))

        dt = timed(g, src, idx)
        vmem.append({"mb": mb, "mrows_per_s": round(NIDX / dt / 1e6, 1)})
        print(f"gather from {mb:4d} MB: {NIDX / dt / 1e6:8.1f} M rows/s",
              flush=True)
        del src
    record["vmem_gather"] = vmem

    # ---- 2. narrow line-pack relayout throughput -------------------------
    Vn, Wn = 1 << 20, 32
    raw = jnp.asarray(rng.standard_normal((Vn, Wn)).astype(np.float32))

    # The probe must NOT commute past the relayout: a plain sum of
    # squares over a pure permutation equals the sum over the input, and
    # XLA's simplifier takes that rewrite — the first version of this
    # bench read 2,976 GB/s (4.4x HBM peak). A per-lane positional scale
    # ties every element to its DESTINATION position, forcing the
    # permutation to be realized.
    lane_scale = 1.0 + jnp.arange(128, dtype=jnp.float32)[None, :] / 128.0

    @jax.jit
    def pack_step(carry, raw):
        i, dep = carry
        r = raw * (1.0 + bump_from(dep).astype(jnp.float32))
        return (i + 1, carry_probe(pack_narrow(r) * lane_scale))

    dt = timed(pack_step, raw)
    phys_bytes = Vn * 128 * 4  # lane-padded source
    record["pack_relayout_gbps"] = round(phys_bytes / dt / 1e9, 2)
    print(f"pack relayout: {record['pack_relayout_gbps']} GB/s", flush=True)

    # ---- 3. tiered-vs-XLA A/B grid (the batch-shape law) -----------------
    V, Wt = 1_000_000, 128  # 512 MB table: > any current VMEM
    V = V // 8 * 8
    table = jnp.concatenate([
        jax.random.uniform(jax.random.key(i), (V // 8, Wt),
                           jnp.float32, -1, 1) for i in range(8)
    ], axis=0)
    table = jax.block_until_ready(table)
    hots = [1, 2, 4, 8] if not args.quick else [1, 8]
    pos_grid = [8192, 16384, 32768, 65536] if not args.quick else [8192, 65536]
    ab = []
    for H in hots:
        cfg, idx_rm, _ = calibrate_powerlaw_workload(
            V, max(pos_grid) // H, H, 1.05, Wt, 4, permute=True, seed=3,
            calib_batches=6,
        )
        for positions in pos_grid:
            B = positions // H
            idx = jnp.asarray(idx_rm[:B])

            def step(backend, tiered):
                @jax.jit
                def s(carry, table, idx):
                    i, dep = carry
                    ii = idx + bump_from(dep)
                    out = embedding_lookup(
                        table, ii, mode=CombineMode.SUM,
                        backend=backend, tiered_cfg=tiered,
                    )
                    return (i + 1, carry_probe(out))
                return s

            t_t = timed(step("tiered", cfg), table, idx)
            t_x = timed(step("xla", None), table, idx)
            ab.append({"positions": positions, "hotness": H,
                       "tiered_ms": round(t_t * 1e3, 4),
                       "xla_ms": round(t_x * 1e3, 4)})
            print(f"H={H:3d} pos={positions:6d}: tiered "
                  f"{t_t * 1e3:7.3f} ms vs xla {t_x * 1e3:7.3f} ms",
                  flush=True)
    record["tiering_ab"] = ab

    derived = derive_chip_constants(record)
    print(json.dumps(derived, indent=1))

    out = args.out
    if out is None:
        slug = "".join(
            ch if ch.isalnum() else "_" for ch in kind).strip("_")
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "cuembed_tpu", "data", f"chip_constants_{slug}.json",
        )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
