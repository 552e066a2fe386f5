#!/usr/bin/env python
"""Stage-level A/B profile of the CSR forward at the round-4 gap point.

Round 4's CSR sweep showed CSR forward 1.8-2.8x slower than the
fixed-hotness twin at identical shapes (VERDICT r4, weak #2;
`results_v5e_r4_csr.csv` vs `results_v5e_r4.csv`). This harness times
every candidate stage of the CSR pipeline in isolation at the worst
committed point (V=1M, W=128, B=32768, H<=16, alpha=1.05) so the fix is
measured, not guessed:

  * the three whole paths (xla / 2-tier / forced 3-tier),
  * the gathers at capacity vs live-sliced width,
  * the full-position segment_sum (the suspected dominant cost),
  * the per-chunk one-hot combine at several (E, GS, one-hot dtype),
  * the merge scatter and the per-chunk sorts.

Methodology matches the sweep: robust_chain_time (min of RPC/fori
chains), carry_probe dependencies, operands (not closures).

Usage: python benchmarks/profile_csr.py [--alpha 1.05] [--batch 32768]
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
    p.add_argument("--alpha", type=float, default=1.05)
    p.add_argument("--batch", type=int, default=32768)
    p.add_argument("--hotness", type=int, default=16)
    p.add_argument("--cats", type=int, default=1_000_000)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--paths-only", action="store_true",
                   help="whole-path A/B only (skip the stage "
                        "microbenches; needed for >HBM/2 tables)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuembed_tpu.ops.api import embedding_lookup_csr, embedding_lookup
    from cuembed_tpu.ops.tiered import auto_config
    from cuembed_tpu.ops.transforms import extract_row_ids_from_csr
    from cuembed_tpu.types import CombineMode
    from cuembed_tpu.utils.benchmarking import (
        bump_from, carry_probe, robust_chain_time,
    )
    from cuembed_tpu.utils.calibration import refine_tiered_config
    from cuembed_tpu.utils.datagen import PowerLawGenerator
    from cuembed_tpu.utils.frequency import count_frequencies, frequency_order

    V, B, H, W, alpha = args.cats, args.batch, args.hotness, args.width, args.alpha
    dtype = jnp.dtype(args.dtype)
    elem = dtype.itemsize
    V = V // 8 * 8

    # ---- workload: same recipe as sweep_runner's CSR slice -------------
    perm_rng = np.random.default_rng(12345)
    permutation = perm_rng.permutation(V).astype(np.int32)

    def gen_batch(hot, a, b, seed):
        if a == 0.0:
            rng = np.random.default_rng(seed)
            return rng.integers(0, V, (b, hot), dtype=np.int64).astype(np.int32)
        g = PowerLawGenerator(V - 1, hot, a, seed=seed, permute=False)
        out = g.sample(b).astype(np.int64)
        out = permutation[out]
        return out.astype(np.int32)

    counts = None
    for i, a in enumerate([1.05, 1.15]):
        for j in range(3):
            c = gen_batch(16, a, 32768, 500 + i * 7 + j)
            counts = count_frequencies(c, V, counts)
    _, remap = frequency_order(counts)

    rng = np.random.default_rng(11 + H)
    dense = gen_batch(H, alpha, B, 7)
    per = rng.integers(0, H + 1, size=B)
    offs_np = np.zeros(B + 1, np.int64)
    offs_np[1:] = np.cumsum(per)
    cap = B * H
    mask = np.arange(H)[None, :] < per[:, None]
    vals_np = np.zeros(cap, np.int32)
    nnz_live = int(offs_np[-1])
    vals_np[:nnz_live] = dense[mask]
    if alpha > 0:
        vals_np[:nnz_live] = remap[vals_np[:nnz_live]]
    avg_hot = max(1, nnz_live // B)

    cfg0 = auto_config(V, W, elem, avg_hot)
    cfg = None
    if cfg0 is not None:
        cfg = refine_tiered_config(cfg0, vals_np[:nnz_live],
                                   capacity_margin=1.12,
                                   calib_offsets=offs_np,
                                   value_capacity=cap)
    print(f"# point: V={V} B={B} Hmax={H} alpha={alpha} live={nnz_live} "
          f"avg_hot={avg_hot} cfg={cfg}", file=sys.stderr)

    parts = 8
    table = jax.block_until_ready(jnp.concatenate([
        jax.random.uniform(jax.random.key(i), (V // parts, W),
                           jnp.float32, -1, 1).astype(dtype)
        for i in range(parts)
    ], axis=0))
    vals = jnp.asarray(vals_np)
    offs = jnp.asarray(offs_np.astype(np.int32))

    x0 = (jnp.int32(0), jnp.float32(0))
    results = {}

    def bench(name, step, *operands):
        st = robust_chain_time(step, x0, operands=operands,
                               k_lo=1, k_hi=max(2, args.iters),
                               repeats=3, return_stats=True)
        results[name] = round(st["median"] * 1e3, 4)
        print(f"{name}: {st['median'] * 1e3:.3f} ms "
              f"(min {st['min'] * 1e3:.3f})", flush=True)

    # ---- whole paths ----------------------------------------------------
    def path_step(backend, tiered):
        @jax.jit
        def step(carry, table, vals, offs):
            i, dep = carry
            vv = vals + bump_from(dep)
            out = embedding_lookup_csr(table, vv, offs,
                                       mode=CombineMode.SUM,
                                       backend=backend, tiered_cfg=tiered)
            return (i + 1, carry_probe(out))
        return step

    # parity gate before timing anything
    if cfg is not None:
        import jax.numpy as _jnp

        a = embedding_lookup_csr(table, vals, offs, mode=CombineMode.SUM,
                                 backend="tiered", tiered_cfg=cfg)
        b = embedding_lookup_csr(table, vals, offs, mode=CombineMode.SUM,
                                 backend="xla")
        err = float(_jnp.max(_jnp.abs(a - b)))
        print(f"# parity max|tiered-xla| = {err:.6f}", file=sys.stderr)
        assert err < 1e-3, err

    bench("path_xla", path_step("xla", None), table, vals, offs)
    if cfg is not None:
        from dataclasses import replace

        from cuembed_tpu.ops.tiered import csr_combine_config
        from cuembed_tpu.utils.calibration import calibrate_csr_fields

        # legacy variants (no live slicing) for the A/B record
        cfg2 = replace(cfg, csr_chunk_samples=0, csr_live_cap=0)
        bench("path_segsum_nolive", path_step("tiered", cfg2),
              table, vals, offs)
        gs3 = min(cfg.chunk_elems, 2 * cfg.chunk_elems // avg_hot + 64)
        cfg3 = replace(cfg, csr_chunk_samples=gs3, csr_live_cap=0)
        bench("path_combine_nolive", path_step("tiered", cfg3),
              table, vals, offs)
        # round-5 engine: calibrated live slice + combine / segsum
        bench("path_combine_live", path_step("tiered", cfg),
              table, vals, offs)
        cfg_ss = replace(cfg, csr_chunk_samples=0)
        bench("path_segsum_live", path_step("tiered", cfg_ss),
              table, vals, offs)
        # combine-only (no classing): the alpha=0 / unordered mode
        cfg_co = csr_combine_config(V, avg_hot)
        if cfg_co is not None:
            cfg_co = calibrate_csr_fields(cfg_co, offs_np, cap,
                                          margin=1.12)
            bench("path_combine_only", path_step("tiered", cfg_co),
                  table, vals, offs)

    # fixed-hotness twin (same live volume served as [B', avg_hot])
    b_twin = nnz_live // avg_hot // 8 * 8
    idx_twin = jnp.asarray(
        vals_np[: b_twin * avg_hot].reshape(b_twin, avg_hot)
    )

    @jax.jit
    def twin_step(carry, table, idx):
        i, dep = carry
        ii = idx + bump_from(dep)
        out = embedding_lookup(table, ii, mode=CombineMode.SUM,
                               backend="tiered", tiered_cfg=cfg0)
        return (i + 1, carry_probe(out))

    if cfg0 is not None:
        bench(f"fixed_twin[{b_twin}x{avg_hot}]", twin_step, table, idx_twin)

    if args.paths_only:
        print(json.dumps({"point": {"V": V, "B": B, "Hmax": H,
                                    "alpha": alpha, "live": nnz_live,
                                    "cap": cap, "W": W,
                                    "dtype": str(dtype)},
                          "ms": results}))
        return

    # ---- stages ----------------------------------------------------------
    C = cfg.hot_rows if cfg is not None else min(V, 221184)
    live_cap = -(-int(nnz_live * 1.08) // 2048) * 2048

    def gather_step(n, src_rows):
        @jax.jit
        def step(carry, table, vals):
            i, dep = carry
            vv = (vals[:n] + bump_from(dep)) % src_rows
            rows = table[:src_rows].at[vv].get(mode="promise_in_bounds")
            return (i + 1, carry_probe(rows))
        return step

    bench("gather_full_cap", gather_step(cap, V), table, vals)
    bench("gather_full_live", gather_step(live_cap, V), table, vals)
    bench("gather_hot_cap", gather_step(cap, C), table, vals)
    bench("gather_hot_live", gather_step(live_cap, C), table, vals)

    # segment_sum over cap vs live positions (rows precomputed: isolates
    # the scatter; the gather is measured separately above)
    sm_np = np.zeros(cap, np.int32)
    sm_np[:nnz_live] = np.repeat(np.arange(B, dtype=np.int32), per)
    sm = jnp.asarray(sm_np)
    rows_pre = jax.block_until_ready(
        jnp.take(table, vals[:live_cap], axis=0))

    def seg_step(n):
        @jax.jit
        def step(carry, rows, sm):
            i, dep = carry
            r = rows[:n] * (1.0 + bump_from(dep).astype(jnp.float32))
            out = jax.ops.segment_sum(r, sm[:n], num_segments=B,
                                      indices_are_sorted=True)
            return (i + 1, carry_probe(out))
        return step

    bench("segsum_live", seg_step(live_cap), rows_pre, sm)

    # per-chunk one-hot combine + merge scatter, over live_cap positions
    E = cfg.chunk_elems if cfg is not None else 2048
    G = live_cap // E

    def combine_step(gs_cap, oh_dtype, merge=True):
        @jax.jit
        def step(carry, rows, sm, offs):
            i, dep = carry
            r = rows[:live_cap] * (1.0 + bump_from(dep).astype(jnp.float32))
            s = sm[:live_cap].reshape(G, E)
            first = s[:, :1]
            local = jnp.minimum(s - first, gs_cap)
            onehot = (
                local[..., None] == jnp.arange(gs_cap, dtype=jnp.int32)
            ).astype(oh_dtype)
            part = jax.lax.dot_general(
                onehot, r.reshape(G, E, W),
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if not merge:
                return (i + 1, carry_probe(part))
            tgt = first + jnp.arange(gs_cap, dtype=jnp.int32)[None, :]
            out = jnp.zeros((B, W), jnp.float32).at[tgt.reshape(-1)].add(
                part.reshape(G * gs_cap, W), mode="drop")
            return (i + 1, carry_probe(out))
        return step

    gs_big = min(E, 2 * E // avg_hot + 64)
    for gs in sorted({gs_big, 320, 384}):
        if gs > E:
            continue
        bench(f"combine_f32_gs{gs}", combine_step(gs, jnp.float32),
              rows_pre, sm, offs)
        bench(f"combine_bf16_gs{gs}", combine_step(gs, jnp.bfloat16),
              rows_pre, sm, offs)
    bench(f"combine_bf16_gs{gs_big}_nomerge",
          combine_step(gs_big, jnp.bfloat16, merge=False),
          rows_pre, sm, offs)

    # sorts at live width: packed 1-op vs 2-op
    @jax.jit
    def sort2_step(carry, vals, sm):
        i, dep = carry
        x = (vals[:live_cap] + bump_from(dep)).reshape(G, E)
        s = sm[:live_cap].reshape(G, E)
        key = jnp.where(x < C, 0, 1)
        comp, s_s = jax.lax.sort([(key << 30) | x, s], dimension=1,
                                 num_keys=1)
        return (i + 1, carry_probe((comp, s_s)))

    @jax.jit
    def sort1_step(carry, vals, sm):
        i, dep = carry
        x = (vals[:live_cap] + bump_from(dep)).reshape(G, E)
        s = sm[:live_cap].reshape(G, E)
        first = s[:, :1]
        local = s - first  # < 2^11 with calibrated spans
        key = jnp.where(x < C, 0, 1)
        comp = (((key << 20) | x) << 11) | jnp.minimum(local, 2047)
        (comp,) = jax.lax.sort([comp], dimension=1, num_keys=1)
        return (i + 1, carry_probe(comp))

    bench("sort2_live", sort2_step, vals, sm)
    if V <= (1 << 20):
        bench("sort1_live", sort1_step, vals, sm)

    @jax.jit
    def extract_step(carry, vals, offs):
        i, dep = carry
        o = offs + bump_from(dep) * 0
        out = extract_row_ids_from_csr(o, vals)
        return (i + 1, carry_probe(out))

    bench("extract_row_ids_cap", extract_step, vals, offs)

    print(json.dumps({"point": {"V": V, "B": B, "Hmax": H, "alpha": alpha,
                                "live": nnz_live, "cap": cap, "W": W},
                      "ms": results}))


if __name__ == "__main__":
    main()
