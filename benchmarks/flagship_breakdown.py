#!/usr/bin/env python
"""Stage-level timing of the tiered flagship forward (perf diagnosis).

Times each pipeline stage of ``tiered_forward`` in isolation with the
exact flagship shapes (10M x 256 bf16, batch 64K, hotness 64) so the
optimization work targets measured costs, not guesses. Each stage is
chained with a data dependency (no (executable, input) repeats — see
utils/benchmarking.chain_time).

Usage: python benchmarks/flagship_breakdown.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.ops.tiered import auto_config
from cuembed_tpu.utils.benchmarking import chain_time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    if args.quick:
        V, B, H, W = 1_000_000, 8192, 32, 256
        dtype = jnp.float32
    else:
        V, B, H, W = 10_000_000, 65_536, 64, 256
        dtype = jnp.bfloat16
    V = (V // 8) * 8

    cfg = auto_config(V, W, jnp.dtype(dtype).itemsize, H)
    print(f"cfg: {cfg}")
    C, E, S_c, S_m, HEAD = (
        cfg.hot_rows, cfg.chunk_elems, cfg.cold_slots, cfg.mid_slots,
        cfg.mxu_head_rows,
    )
    N = B * H
    G = -(-N // E)
    GS = E // H
    acc = jnp.float32

    @jax.jit
    def make_table():
        parts = [
            jax.random.uniform(
                jax.random.key(i), (V // 8, W), jnp.float32, -1, 1
            ).astype(dtype)
            for i in range(8)
        ]
        return jnp.concatenate(parts, axis=0)

    table = jax.block_until_ready(make_table())

    # Power-law-ish frequency-ordered ids: idx = floor(u^(1/(1-a)) * V)
    # approximated host-side; exact distribution doesn't matter for stage
    # timing, tier fractions do — use measured flagship fractions.
    rng = np.random.default_rng(0)
    u = rng.random(N)
    gamma = 1.0 - 1.15
    lo, hi = 1.0, float(V)
    idx_np = (u * (hi ** gamma - lo ** gamma) + lo ** gamma) ** (1.0 / gamma)
    idx_np = np.minimum(idx_np.astype(np.int64), V - 1).astype(np.int32)
    frac_head = float((idx_np < HEAD).mean())
    frac_mid = float(((idx_np >= HEAD) & (idx_np < C)).mean())
    frac_cold = float((idx_np >= C).mean())
    print(f"fractions: head={frac_head:.3f} mid={frac_mid:.3f} "
          f"cold={frac_cold:.3f}  G={G} GS={GS} S_m={S_m} S_c={S_c}")

    idx = jnp.asarray(idx_np.reshape(B, H))
    xi = jnp.asarray(idx_np[: G * E].reshape(G, E))
    key = jnp.where(xi < HEAD, 1, jnp.where(xi < C, 0, 2))
    idx_bits = max(1, (V - 1).bit_length())
    gs_bits = max(1, (GS - 1).bit_length())
    sm = jax.lax.broadcasted_iota(jnp.int32, (G, E), 1) // H
    comp0 = (((key << idx_bits) | xi) << gs_bits) | sm

    # gather operands for isolated stage timing (values irrelevant)
    mid_idx = jnp.asarray(
        rng.integers(0, C, size=(G * S_m,), dtype=np.int32))
    cold_idx = jnp.asarray(
        rng.integers(0, V, size=(G * S_c,), dtype=np.int32))
    s_slots_m = jnp.asarray(
        rng.integers(0, GS, size=(G, S_m), dtype=np.int32))
    s_slots_c = jnp.asarray(
        rng.integers(0, GS, size=(G, S_c), dtype=np.int32))

    results = {}

    def bench(name, fn, x0=jnp.int32(0), **kw):
        dt = chain_time(fn, x0, k_lo=1, k_hi=4, repeats=3, **kw)
        results[name] = dt * 1e3
        print(f"{name:40s} {dt*1e3:8.3f} ms")

    # --- 1. sort (packed single key) ---------------------------------
    @jax.jit
    def sort_step(carry):
        c = comp0 + (carry & 1)
        (s,) = jax.lax.sort([c], dimension=1, num_keys=1)
        return s[0, 0]

    bench("sort packed key [G,E]", sort_step)

    # --- 2. head M build (compare-reduce) ----------------------------
    @jax.jit
    def head_m_step(carry):
        i2 = idx + (carry & 1)
        cols = jnp.arange(HEAD, dtype=jnp.int32)
        m = jnp.sum(
            jnp.where(i2[:, :, None] == cols[None, None, :], acc(1.0), 0),
            axis=1, dtype=acc,
        )
        return m[0, 0].astype(jnp.int32)

    bench("head M compare-reduce f32", head_m_step)

    @jax.jit
    def head_m_bf16_step(carry):
        i2 = idx + (carry & 1)
        cols = jnp.arange(HEAD, dtype=jnp.int32)
        m = jnp.sum(
            jnp.where(i2[:, :, None] == cols[None, None, :],
                      jnp.bfloat16(1.0), jnp.bfloat16(0)),
            axis=1, dtype=acc,
        )
        return m[0, 0].astype(jnp.int32)

    bench("head M compare-reduce bf16", head_m_bf16_step)

    # --- 3. head matmul ----------------------------------------------
    m_f32 = jnp.zeros((B, HEAD), acc)

    @jax.jit
    def head_mm_impl(table, carry):
        m = m_f32 + carry.astype(acc)
        out = jnp.dot(m, table[:HEAD].astype(acc),
                      preferred_element_type=acc,
                      precision=jax.lax.Precision.HIGHEST)
        return out[0, 0].astype(jnp.int32)

    bench("head matmul [B,HEAD]@[HEAD,W] f32",
          lambda c: head_mm_impl(table, c))

    # --- 4. mid gather ------------------------------------------------
    @jax.jit
    def mid_gather_impl(table, carry):
        mi = mid_idx + (carry & 1)
        rows = jnp.take(table[:C], mi, axis=0)
        return rows[0, 0].astype(jnp.int32)

    bench(f"mid gather {G*S_m} rows from table[:C]",
          lambda c: mid_gather_impl(table, c))

    # --- 5. cold gather ----------------------------------------------
    @jax.jit
    def cold_gather_impl(table, carry):
        ci = cold_idx + (carry & 1)
        rows = jnp.take(table, ci, axis=0)
        return rows[0, 0].astype(jnp.int32)

    bench(f"cold gather {G*S_c} rows from table",
          lambda c: cold_gather_impl(table, c))

    # --- 6. one-hot combine, f32 vs bf16 one-hot ---------------------
    rows_m = jnp.zeros((G, S_m, W), dtype)

    def combine(rows, samples, onehot_dt, S):
        onehot = (
            samples[..., None] == jnp.arange(GS, dtype=jnp.int32)
        ).astype(onehot_dt)
        part = jax.lax.dot_general(
            onehot, rows,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=acc,
            precision=jax.lax.Precision.HIGHEST,
        )
        return part

    @jax.jit
    def combine_f32_step(carry):
        s = s_slots_m + (carry & 1)
        part = combine(rows_m, s, acc, S_m)
        return part[0, 0, 0].astype(jnp.int32)

    bench("mid combine one-hot f32", combine_f32_step)

    @jax.jit
    def combine_bf16_step(carry):
        s = s_slots_m + (carry & 1)
        part = combine(rows_m, s, jnp.bfloat16, S_m)
        return part[0, 0, 0].astype(jnp.int32)

    bench("mid combine one-hot bf16", combine_bf16_step)

    rows_c = jnp.zeros((G, S_c, W), dtype)

    @jax.jit
    def combine_cold_step(carry):
        s = s_slots_c + (carry & 1)
        part = combine(rows_c, s, acc, S_c)
        return part[0, 0, 0].astype(jnp.int32)

    bench("cold combine one-hot f32", combine_cold_step)

    @jax.jit
    def combine_cold_bf16_step(carry):
        s = s_slots_c + (carry & 1)
        part = combine(rows_c, s, jnp.bfloat16, S_c)
        return part[0, 0, 0].astype(jnp.int32)

    bench("cold combine one-hot bf16", combine_cold_bf16_step)

    # --- 7. full tiered forward for comparison -----------------------
    from cuembed_tpu.ops.tiered import tiered_forward
    from cuembed_tpu.types import CombineMode

    @jax.jit
    def full_impl(table, carry):
        i2 = idx + (carry * 0)
        out = tiered_forward(table, i2, mode=CombineMode.SUM, cfg=cfg)
        return out[0, 0].astype(jnp.int32)

    bench("FULL tiered_forward", lambda c: full_impl(table, c))

    known = sum(v for k, v in results.items()
                if k.startswith(("sort", "head M compare-reduce f32",
                                 "head matmul", "mid gather", "cold gather",
                                 "mid combine one-hot f32",
                                 "cold combine one-hot f32")))
    print(f"\nsum of f32-variant stages: {known:.3f} ms "
          f"vs full {results['FULL tiered_forward']:.3f} ms")


if __name__ == "__main__":
    main()
