#!/usr/bin/env python
"""Microbenchmarks of the TPU primitives underlying the engine design.

Measures the rates documented in ``docs/PERF_NOTES.md``: random row
gather vs operand size/width, streaming bandwidth, sort/scan/scatter
costs. Run on a real chip when porting to new TPU generations:

    python benchmarks/microbench.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(step, x0, k_lo=1, k_hi=4, repeats=3):
    from cuembed_tpu.utils.benchmarking import chain_time as _ct

    return _ct(step, x0, k_lo=k_lo, k_hi=k_hi, repeats=repeats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N = 65_536 if args.quick else 262_144

    # streaming bandwidth
    big_mb = 64 if args.quick else 1024
    big = jax.block_until_ready(jnp.ones((big_mb, 1024, 256), jnp.float32))

    @jax.jit
    def stream(big, c):
        return jnp.float32(jnp.sum(big * (1.0 + c * 0)))

    dt = chain_time(lambda c: stream(big, c), jnp.float32(0))
    print(f"stream reduce {big_mb} MiB: {big_mb/1024/dt:.1f} GiB/s")
    del big

    # gather rate vs table size and width
    for V, W in ((16_384, 256), (98_304, 256), (1_048_576, 256),
                 (1_048_576, 128), (524_288, 512)):
        if args.quick and V > 200_000:
            continue
        table = jax.block_until_ready(jnp.full((V, W), 0.5, jnp.float32))
        idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))

        @jax.jit
        def take(table, idx, c):
            out = jnp.take(table, idx + (c * 0).astype(jnp.int32), axis=0)
            return jnp.float32(out[0, 0])

        dt = chain_time(lambda c: take(table, idx, c), jnp.float32(0))
        mb = V * W * 4 / 1e6
        print(f"take V={V:8d} W={W:4d} ({mb:6.0f} MB): "
              f"{N/dt/1e6:7.1f} Mrows/s  {N*W*4/dt/1e9:6.1f} GB/s")
        del table

    # sort / cumsum / scatter
    M = N
    keys = jnp.asarray(rng.integers(0, 10_000_000, M).astype(np.int32))
    payload = jnp.arange(M, dtype=jnp.int32)

    @jax.jit
    def do_sort(keys, payload, c):
        k, v = jax.lax.sort(
            [keys + (c * 0).astype(jnp.int32), payload], num_keys=1
        )
        return jnp.float32(k[0] + v[0])

    dt = chain_time(lambda c: do_sort(keys, payload, c), jnp.float32(0))
    print(f"global sort {M}: {dt*1e3:.2f} ms")

    G, E = M // 1024, 1024
    @jax.jit
    def row_sort(keys, payload, c):
        k2 = (keys + (c * 0).astype(jnp.int32)).reshape(G, E)
        p2 = payload.reshape(G, E)
        k, v = jax.lax.sort([k2, p2], dimension=1, num_keys=1)
        return jnp.float32(k[0, 0] + v[0, 0])

    dt = chain_time(lambda c: row_sort(keys, payload, c), jnp.float32(0))
    print(f"row-wise sort [{G},{E}]: {dt*1e3:.2f} ms")

    @jax.jit
    def do_cumsum(x, c):
        return jnp.float32(jnp.cumsum(x + (c * 0).astype(jnp.int32))[-1])

    dt = chain_time(lambda c: do_cumsum(payload, c), jnp.float32(0))
    print(f"cumsum {M}: {dt*1e3:.2f} ms")

    U, W = 65_536, 256
    gsrc = jax.block_until_ready(jnp.full((N, W), 0.5, jnp.float32))
    ridx = jnp.asarray(np.sort(rng.integers(0, U, N)).astype(np.int32))

    @jax.jit
    def scat_rows(gsrc, ridx, c):
        out = jnp.zeros((U, W), jnp.float32).at[
            ridx + (c * 0).astype(jnp.int32)
        ].add(gsrc, indices_are_sorted=True)
        return jnp.float32(out[0, 0])

    dt = chain_time(lambda c: scat_rows(gsrc, ridx, c), jnp.float32(0))
    print(f"row scatter-add N={N} U={U}: {N/dt/1e6:.1f} Mrows/s")

    @jax.jit
    def segsum(gsrc, ridx, c):
        out = jax.ops.segment_sum(
            gsrc, ridx + (c * 0).astype(jnp.int32),
            num_segments=U, indices_are_sorted=True,
        )
        return jnp.float32(out[0, 0])

    dt = chain_time(lambda c: segsum(gsrc, ridx, c), jnp.float32(0))
    print(f"segment_sum N={N} U={U}: {N/dt/1e6:.1f} Mrows/s")


if __name__ == "__main__":
    main()
