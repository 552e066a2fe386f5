#!/usr/bin/env python
"""Run-deduplicated mid-tier gather: distribution analysis + on-chip A/B.

The round-2 review proposed gathering once per *run* of equal indices
after the per-chunk sort (the forward analog of the GPU L2 serving
duplicates, ``/root/reference/README.md:4``) and combining runs into
samples with the one-hot MXU machinery. Whether that wins is purely a
property of the run-length distribution of the mid/cold forward stream,
so this harness measures both halves:

1. ``--analyze`` (host): per-chunk unique/slot ratios of the *forward*
   tiered stream for the flagship workload. NB the backward stream's
   density (median ~33 unique per 2048-chunk) comes from the GLOBAL
   index sort; the forward sorts per chunk of ~2048 random draws, whose
   mid band is mostly unique within a chunk.

2. On-chip A/B (TPU): production-shaped mid gather + one-hot combine
   (A) vs the dedup prototype (B): run-start detection, run-id cumsum,
   a second row-wise sort compacting the one-gather-per-run index list
   to a static capacity, the run->(sample) coefficient matrix built by
   a double-one-hot MXU dot, and the final runs->samples combine. Both
   read the same [G, S] sorted slot arrays from a VMEM-resident head
   slice, so the delta isolates dedup cost/benefit.

Result (v5e, committed in docs/PERF_NOTES.md): the flagship mid stream
dedups only ~1.12x within a chunk and the cold stream 1.00x, so B pays
more in sort+matmul than it saves in descriptors; the lever only pays
at per-chunk duplication levels the flagship distribution never reaches.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def analyze(alpha: float, V: int, B: int, H: int):
    """Host-side: unique/slot ratios of the forward tiered stream."""
    from cuembed_tpu.utils.calibration import calibrate_powerlaw_workload

    cfg, idx_rm, _ = calibrate_powerlaw_workload(
        V, B, H, alpha, 256, 2, permute=True, seed=7, capacity_margin=1.05
    )
    E = cfg.chunk_elems
    HEAD, C = cfg.mxu_head_rows, cfg.hot_rows
    flat = idx_rm.reshape(-1)
    flat = np.pad(flat, (0, (-flat.size) % E))
    ch = np.sort(flat.reshape(-1, E), axis=1)
    G = ch.shape[0]
    stats = {}
    for name, lo, hi in (("mid", HEAD, C), ("cold", C, 1 << 62)):
        slots = np.zeros(G, np.int64)
        uniq = np.zeros(G, np.int64)
        for g in range(G):
            band = ch[g][(ch[g] >= lo) & (ch[g] < hi)]
            slots[g] = band.size
            uniq[g] = np.unique(band).size
        stats[name] = (slots, uniq)
        print(
            f"{name}: slots mean {slots.mean():.0f} max {slots.max()}; "
            f"uniques mean {uniq.mean():.0f} "
            f"p50 {np.percentile(uniq, 50):.0f} "
            f"p99 {np.percentile(uniq, 99):.0f}; "
            f"dedup ratio {slots.sum() / max(uniq.sum(), 1):.3f}x"
        )
    return cfg, stats


def ab(alpha: float, V: int, B: int, H: int, dup_boost: int):
    """On-chip A/B of the mid-tier combine with and without run dedup.

    ``dup_boost > 1`` divides the mid-band index range by that factor,
    synthetically raising per-chunk duplication to show where the dedup
    design WOULD win — the sensitivity half of the negative result.
    """
    import jax
    import jax.numpy as jnp

    from cuembed_tpu.utils.benchmarking import chain_time
    from cuembed_tpu.utils.calibration import calibrate_powerlaw_workload

    cfg, idx_rm, _ = calibrate_powerlaw_workload(
        V, B, H, alpha, 256, 2, permute=True, seed=7, capacity_margin=1.05
    )
    E = cfg.chunk_elems
    HEAD, C = cfg.mxu_head_rows, cfg.hot_rows
    W = 256
    GS = E // H
    S = cfg.mid_slots

    flat = idx_rm.reshape(-1)
    flat = np.pad(flat, (0, (-flat.size) % E))
    G = flat.size // E
    sm = (np.arange(flat.size, dtype=np.int32) % E) // H
    # build the production mid slice: per-chunk sorted mid-band indices
    # compacted to S slots (host-side staging; both variants read the
    # same arrays, so staging cost is out of the measurement)
    xs = np.zeros((G, S), np.int32)
    ss = np.full((G, S), GS, np.int32)
    cnt = np.zeros(G, np.int32)
    ch = flat.reshape(G, E)
    chs = sm.reshape(G, E)
    for g in range(G):
        m = (ch[g] >= HEAD) & (ch[g] < C)
        band = ch[g][m]
        if dup_boost > 1:
            band = HEAD + (band - HEAD) // dup_boost
        order = np.argsort(band, kind="stable")
        n = min(band.size, S)
        xs[g, :n] = band[order][:n]
        ss[g, :n] = chs[g][m][order][:n]
        cnt[g] = n
    uniq = np.array([np.unique(xs[g, : cnt[g]]).size for g in range(G)])
    print(
        f"# mid slots/chunk mean {cnt.mean():.0f}, uniques mean "
        f"{uniq.mean():.0f} max {uniq.max()} (dedup "
        f"{cnt.sum() / uniq.sum():.2f}x), S={S}, G={G}, GS={GS}"
    )
    U = int(min(S, -(-int(uniq.max() * 1.1) // 8) * 8))

    head = jax.block_until_ready(
        jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((C, W))
            .astype(np.float32)
        ).astype(jnp.bfloat16)
    )
    xs_d = jnp.asarray(xs)
    ss_d = jnp.asarray(ss)
    cnt_d = jnp.asarray(cnt)

    def combine(rows, cols, n_cols):
        onehot = (
            cols[..., None] == jnp.arange(n_cols, dtype=jnp.int32)
        ).astype(jnp.float32)
        return jax.lax.dot_general(
            onehot, rows,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @jax.jit
    def variant_a(head, xs, ss, carry):
        i, dep = carry
        x = xs + (dep * 0).astype(jnp.int32)
        rows = jnp.take(head, x.reshape(-1), axis=0).reshape(G, S, W)
        out = combine(rows, ss, GS)  # [G, GS, W]
        return (i + 1, out[0, 0, 0].astype(jnp.float32))

    @jax.jit
    def variant_b(head, xs, ss, cnt, carry):
        i, dep = carry
        x = xs + (dep * 0).astype(jnp.int32)
        live = (
            jax.lax.broadcasted_iota(jnp.int32, (G, S), 1) < cnt[:, None]
        )
        start = jnp.concatenate(
            [live[:, :1], (x[:, 1:] != x[:, :-1]) & live[:, 1:]], axis=1
        )
        run = jnp.cumsum(start.astype(jnp.int32), axis=1) - 1  # [G, S]
        # compact one index per run to the front: dups sort behind
        key = jnp.where(start & live, x, (1 << 30) | x)
        (ks,) = jax.lax.sort([key], dimension=1, num_keys=1)
        u_idx = (ks & ((1 << 30) - 1))[:, :U]
        u_rows = jnp.take(head, u_idx.reshape(-1), axis=0).reshape(G, U, W)
        # run->sample coefficient matrix via double one-hot MXU dot
        run_l = jnp.where(live, run, U)
        oh_run = (
            run_l[..., None] == jnp.arange(U, dtype=jnp.int32)
        ).astype(jnp.float32)  # [G, S, U]
        oh_sm = (
            ss[..., None] == jnp.arange(GS, dtype=jnp.int32)
        ).astype(jnp.float32)  # [G, S, GS]
        m = jax.lax.dot_general(
            oh_run, oh_sm,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [G, U, GS]
        out = jax.lax.dot_general(
            m, u_rows,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [G, GS, W]
        return (i + 1, out[0, 0, 0].astype(jnp.float32))

    # parity first
    a = variant_a(head, xs_d, ss_d, (jnp.int32(0), jnp.float32(0)))
    b = variant_b(head, xs_d, ss_d, cnt_d, (jnp.int32(0), jnp.float32(0)))
    print(f"# parity |a-b| on probe: {abs(float(a[1]) - float(b[1])):.5f}")

    ta = chain_time(
        lambda c: variant_a(head, xs_d, ss_d, c),
        (jnp.int32(0), jnp.float32(0)), k_lo=1, k_hi=4, repeats=3,
    )
    tb = chain_time(
        lambda c: variant_b(head, xs_d, ss_d, cnt_d, c),
        (jnp.int32(0), jnp.float32(0)), k_lo=1, k_hi=4, repeats=3,
    )
    n_slots = int(cnt.sum())
    n_uniq = int(uniq.sum())
    print(
        f"A (per-slot gather+combine): {ta * 1e3:.2f} ms "
        f"({n_slots / ta / 1e6:.0f} M slots/s)"
    )
    print(
        f"B (dedup: {n_uniq / 1e6:.2f}M uniques of {n_slots / 1e6:.2f}M "
        f"slots, U_cap {U}): {tb * 1e3:.2f} ms"
    )
    print(
        f"dedup_boost={dup_boost} ratio={cnt.sum() / uniq.sum():.2f}x "
        f"=> B/A = {tb / ta:.2f}"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--analyze", action="store_true")
    p.add_argument("--alpha", type=float, default=1.15)
    p.add_argument("--num-categories", type=int, default=10_000_000)
    p.add_argument("--batch", type=int, default=65_536)
    p.add_argument("--hotness", type=int, default=64)
    p.add_argument("--dup-boost", type=int, default=1,
                   help=">1 synthetically raises per-chunk duplication")
    args = p.parse_args()
    t0 = time.time()
    if args.analyze:
        analyze(args.alpha, args.num_categories, args.batch, args.hotness)
    else:
        ab(args.alpha, args.num_categories, args.batch, args.hotness,
           args.dup_boost)
    print(f"# {time.time() - t0:.0f}s", file=sys.stderr)
