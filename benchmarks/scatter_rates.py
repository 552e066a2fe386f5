#!/usr/bin/env python
"""Scatter-add rate vs target-operand size (backward's bound).

If scatter into a VMEM-servable target runs at VMEM-gather-like rates,
the tiered backward can scatter the mid tier into a [hot_rows, W]
partial buffer and fold it into the full gradient with one stream op.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.utils.benchmarking import chain_time

W = 256
K = 1 << 21  # 2M updates


def main():
    rng = np.random.default_rng(0)
    upd = jnp.asarray(rng.standard_normal((K, W)).astype(np.float32))
    upd_bf = upd.astype(jnp.bfloat16)

    for mb in (4, 48, 108, 512):
        rows = mb * 1024 * 1024 // (W * 4)
        tgt = jnp.zeros((rows, W), jnp.float32)
        idx_np = np.sort(rng.integers(0, rows, (K,), dtype=np.int32))
        idx = jnp.asarray(idx_np)
        idx_u = jnp.asarray(rng.integers(0, rows, (K,), dtype=np.int32))

        @jax.jit
        def scat(tgt, idx, upd, carry):
            i = idx + (carry & 1)
            out = tgt.at[i].add(upd, mode="drop", indices_are_sorted=True)
            return out[0, 0].astype(jnp.int32)

        @jax.jit
        def scat_u(tgt, idx, upd, carry):
            i = idx + (carry & 1)
            out = tgt.at[i].add(upd, mode="drop")
            return out[0, 0].astype(jnp.int32)

        dt = chain_time(lambda c: scat(tgt, idx, upd, c), jnp.int32(0),
                        k_lo=1, k_hi=4, repeats=3)
        print(f"scatter-add 2M f32 rows -> {mb:4d} MB target, sorted   "
              f"{dt*1e3:8.3f} ms  {K/dt/1e6:7.1f} M rows/s", flush=True)
        dt = chain_time(lambda c: scat_u(tgt, idx_u, upd, c), jnp.int32(0),
                        k_lo=1, k_hi=4, repeats=3)
        print(f"scatter-add 2M f32 rows -> {mb:4d} MB target, unsorted "
              f"{dt*1e3:8.3f} ms  {K/dt/1e6:7.1f} M rows/s", flush=True)
        del tgt

    # segment_sum comparison at the same shape (sorted ids)
    rows = 512 * 1024 * 1024 // (W * 4)
    idx = jnp.asarray(np.sort(rng.integers(0, rows, (K,), dtype=np.int32)))

    @jax.jit
    def seg(idx, upd, carry):
        i = idx + (carry & 1)
        out = jax.ops.segment_sum(upd, i, num_segments=rows,
                                  indices_are_sorted=True)
        return out[0, 0].astype(jnp.int32)

    dt = chain_time(lambda c: seg(idx, upd, c), jnp.int32(0),
                    k_lo=1, k_hi=4, repeats=3)
    print(f"segment_sum 2M f32 rows -> 512 MB target, sorted        "
          f"{dt*1e3:8.3f} ms  {K/dt/1e6:7.1f} M rows/s", flush=True)

    # gy row-gather from a VMEM-sized grad_y (backward's other half)
    gy = jnp.asarray(rng.standard_normal((65536, W)).astype(np.float32))
    sid = jnp.asarray(rng.integers(0, 65536, (1 << 22,), dtype=np.int32))

    @jax.jit
    def gyg(gy, sid, carry):
        r = jnp.take(gy, sid + (carry & 1), axis=0)
        return r[0, 0].astype(jnp.int32)

    dt = chain_time(lambda c: gyg(gy, sid, c), jnp.int32(0),
                    k_lo=1, k_hi=4, repeats=3)
    print(f"gather 4M rows from 67MB grad_y                          "
          f"{dt*1e3:8.3f} ms  {(1<<22)/dt/1e6:7.1f} M rows/s", flush=True)


if __name__ == "__main__":
    main()
