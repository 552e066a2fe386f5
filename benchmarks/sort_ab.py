#!/usr/bin/env python
"""A/B the COO transpose sort strategies at flagship volume.

The round-4 verdict flagged transpose (a global multi-operand
``lax.sort``) as the slowest un-attacked stage: ~7 ms for 4.2M keys
where the engine's own per-chunk packed-key sort does the same volume
in ~1 ms. Candidates measured here:

  A. current: lax.sort([idx, sid], num_keys=2)
  B. lax.sort([idx, sid], num_keys=1)           (ties unspecified)
  C. packed int64 (idx << 32 | sid), 1 operand  (EXACT same order as A)
  D. packed int32 (idx << sid_bits | sid) where bits fit
  E. backward-shaped: per-chunk compaction of non-head positions
     (static slices) -> global packed sort of the ~nonhead fraction
  F. per-chunk packed int32 sort of the full volume (for reference:
     the known ~1 ms row-wise sort; NOT a valid transpose)

Usage: python benchmarks/sort_ab.py [--nnz 4194304] [--vocab 10000000]
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
    p.add_argument("--nnz", type=int, default=64 * 65536)
    p.add_argument("--vocab", type=int, default=10_000_000)
    p.add_argument("--alpha", type=float, default=1.15)
    p.add_argument("--head", type=int, default=128,
                   help="MXU head rows (masked to sentinel pre-sort)")
    p.add_argument("--hot", type=int, default=221184,
                   help="frequency-ordered hot boundary for stage E "
                        "classing stats")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax

    # int64 candidates need x64; safe to flip in a standalone bench (the
    # library itself cannot assume it — callers run x64-disabled).
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from cuembed_tpu.utils.benchmarking import (
        bump_from, carry_probe, robust_chain_time,
    )
    from cuembed_tpu.utils.datagen import PowerLawGenerator

    N, V = args.nnz, args.vocab
    # permute=False: ids are natural-order (hot-first) like the engine's
    # frequency-remapped stream — the classing stats for stage E depend
    # on it (with permuted ids nothing is "head").
    gen = PowerLawGenerator(V - 1, 1, args.alpha, seed=7, permute=False)
    idx_np = gen.sample(N).reshape(-1).astype(np.int32)
    sid_np = (np.arange(N, dtype=np.int32) // 64)
    idx = jnp.asarray(idx_np)
    sid = jnp.asarray(sid_np)
    x0 = (jnp.int32(0), jnp.float32(0))
    results = {}

    def bench(name, step, *ops):
        st = robust_chain_time(step, x0, operands=ops, k_lo=1,
                               k_hi=max(2, args.iters), repeats=3,
                               return_stats=True)
        results[name] = round(st["median"] * 1e3, 4)
        print(f"{name}: {st['median'] * 1e3:.3f} ms "
              f"(min {st['min'] * 1e3:.3f})", flush=True)

    @jax.jit
    def sort_2key(carry, idx, sid):
        i, dep = carry
        x = idx + bump_from(dep)
        t_i, t_s = jax.lax.sort((x, sid), num_keys=2)
        return (i + 1, carry_probe((t_i, t_s)))

    @jax.jit
    def sort_1key(carry, idx, sid):
        i, dep = carry
        x = idx + bump_from(dep)
        t_i, t_s = jax.lax.sort([x, sid], num_keys=1)
        return (i + 1, carry_probe((t_i, t_s)))

    @jax.jit
    def sort_i64(carry, idx, sid):
        i, dep = carry
        x = (idx + bump_from(dep)).astype(jnp.int64)
        comp = (x << 32) | sid.astype(jnp.int64)
        (comp,) = jax.lax.sort([comp], num_keys=1)
        t_i = (comp >> 32).astype(jnp.int32)
        t_s = (comp & 0x7FFFFFFF).astype(jnp.int32)
        return (i + 1, carry_probe((t_i, t_s)))

    bench("A_sort_2key", sort_2key, idx, sid)
    bench("B_sort_1key", sort_1key, idx, sid)
    bench("C_sort_i64_packed", sort_i64, idx, sid)

    sid_bits = max(1, int(sid_np.max()).bit_length())
    idx_bits = max(1, (V - 1).bit_length())
    if idx_bits + sid_bits <= 31:
        @jax.jit
        def sort_i32(carry, idx, sid):
            i, dep = carry
            x = idx + bump_from(dep)
            comp = (x << sid_bits) | sid
            (comp,) = jax.lax.sort([comp], num_keys=1)
            return (i + 1, carry_probe(comp))

        bench("D_sort_i32_packed", sort_i32, idx, sid)
    else:
        print(f"D skipped: idx_bits={idx_bits} + sid_bits={sid_bits} > 31")

    # E: per-chunk compaction of non-head (static capacity from the real
    # nonhead fraction + margin), then a global packed i64 sort of the
    # compacted stream. This is the backward's shape: head positions are
    # matmul-served, so only non-head needs grouping.
    E_ = 2048
    G = N // E_
    nh = idx_np >= args.head
    nh_frac = float(nh.mean())
    per_chunk = nh[: G * E_].reshape(G, E_).sum(1)
    k_cap = min(E_, int(per_chunk.max() * 1.1 + 8) // 8 * 8)
    print(f"# nonhead frac {nh_frac:.3f}, per-chunk max {per_chunk.max()}"
          f", slot cap {k_cap}", flush=True)

    idxb = max(1, (V - 1).bit_length())

    @jax.jit
    def sort_compact_nonhead(carry, idx, sid):
        # int32-only (library-usable): per-chunk 2-op sort keyed
        # (head?, idx) with sid payload, static front slices compact the
        # non-head stream, then one global 2-op sort over ~nonhead_frac
        # of the volume. Head positions are matmul-served in the
        # backward, so they never need grouping.
        i, dep = carry
        x = (idx + bump_from(dep)).reshape(G, E_)
        s = sid.reshape(G, E_)
        key = (x >= args.head).astype(jnp.int32)  # nonhead sorts FIRST
        comp = ((1 - key) << idxb) | x
        comp, s_s = jax.lax.sort([comp, s], dimension=1, num_keys=1)
        front_i = comp[:, :k_cap].reshape(-1)  # nonhead (+ head spill)
        front_s = s_s[:, :k_cap].reshape(-1)
        t_i, t_s = jax.lax.sort([front_i, front_s], num_keys=1)
        return (i + 1, carry_probe((t_i, t_s)))

    bench("E_compact_nonhead_then_sort", sort_compact_nonhead, idx, sid)

    @jax.jit
    def sort_chunked_only(carry, idx, sid):
        i, dep = carry
        x = (idx + bump_from(dep)).reshape(G, E_)
        comp = (x.astype(jnp.int64) << 32) | sid.reshape(G, E_).astype(
            jnp.int64
        )
        (comp,) = jax.lax.sort([comp], dimension=1, num_keys=1)
        return (i + 1, carry_probe(comp))

    bench("F_chunked_rowwise_only", sort_chunked_only, idx, sid)

    print(json.dumps({"nnz": N, "vocab": V, "ms": results,
                      "nonhead_frac": round(nh_frac, 4)}))


if __name__ == "__main__":
    main()
