#!/usr/bin/env python
"""A/B: why are in-context gathers slower than isolated ones?

Crosses {dedicated operand, slice of a 5.4GB table} x {uniform, zipf}
index distributions at the flagship mid-gather shape.
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
C = 221184          # hot head rows (108MB bf16)
NIDX = 2_490_368    # flagship mid slots
V = 10_000_000


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def make_table():
        parts = [
            jax.random.uniform(
                jax.random.key(i), (V // 8, W), jnp.float32, -1, 1
            ).astype(jnp.bfloat16)
            for i in range(8)
        ]
        return jnp.concatenate(parts, axis=0)

    big = jax.block_until_ready(make_table())
    small = jax.block_until_ready(big[:C] + 0)  # dedicated operand

    idx_uni = rng.integers(128, C, size=(NIDX,), dtype=np.int32)
    # zipf-ish over [128, C): inverse-CDF r = (u*(C^g - 128^g) + 128^g)^(1/g)
    g = 1.0 - 1.15
    u = rng.random(NIDX)
    z = (u * (C ** g - 128.0 ** g) + 128.0 ** g) ** (1.0 / g)
    idx_zipf = np.minimum(z, C - 1).astype(np.int32)

    def bench(name, src_big, idx_np, use_slice):
        idx = jnp.asarray(idx_np)

        @jax.jit
        def step(src, idx, carry):
            s = src[:C] if use_slice else src
            r = jnp.take(s, idx + (carry & 1), axis=0)
            return r[0, 0].astype(jnp.int32)

        src = big if use_slice else small
        dt = chain_time(lambda c: step(src, idx, c), jnp.int32(0),
                        k_lo=1, k_hi=4, repeats=3)
        print(f"{name:44s} {dt*1e3:8.3f} ms  {NIDX/dt/1e6:7.1f} M rows/s",
              flush=True)

    bench("dedicated operand, uniform idx", False, idx_uni, False)
    bench("dedicated operand, zipf idx", False, idx_zipf, False)
    bench("slice of 5.4GB table, uniform idx", True, idx_uni, True)
    bench("slice of 5.4GB table, zipf idx", True, idx_zipf, True)

    # sorted-within-chunk variants (what the real pipeline feeds)
    srt = np.sort(idx_zipf.reshape(-1, 1216), axis=1).reshape(-1)
    bench("dedicated, zipf chunk-sorted", False, srt, False)
    bench("slice, zipf chunk-sorted", True, srt, True)

    # consumed-by-matmul variant: does materializing the rows cost extra?
    G, S = 2048, 1216
    GS = 32
    s_slots = jnp.asarray(rng.integers(0, GS, (G, S), dtype=np.int32))
    idx = jnp.asarray(srt)

    @jax.jit
    def gather_combine(src, idx, slots, carry):
        s = src[:C]
        r = jnp.take(s, idx + (carry & 1), axis=0).reshape(G, S, W)
        onehot = (
            slots[..., None] == jnp.arange(GS, dtype=jnp.int32)
        ).astype(jnp.float32)
        part = jax.lax.dot_general(
            onehot, r,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return part[0, 0, 0].astype(jnp.int32)

    dt = chain_time(lambda c: gather_combine(big, idx, s_slots, c),
                    jnp.int32(0), k_lo=1, k_hi=4, repeats=3)
    print(f"{'slice + zipf-sorted + one-hot combine':44s} {dt*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
