#!/usr/bin/env python
"""In-context stage costs of the tiered flagship forward.

Replicates ``tiered._forward_fixed_3tier`` with a cumulative ``upto``
knob and times each prefix with the REAL workload (power-law multi-hot,
frequency-remapped, calibrated capacities — via utils/calibration).
Adjacent differences are the in-graph marginal stage costs — unlike
flagship_breakdown.py these include XLA's actual fusions and any
bookkeeping the isolated stages hide.

Stages: 0 coeff+pack, 1 +sort, 2 +mid gather, 3 +mid combine,
4 +cold gather, 5 +cold combine (= fast branch), 6 +head (= full).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.utils.benchmarking import chain_time
from cuembed_tpu.utils.calibration import calibrate_powerlaw_workload


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    if args.quick:
        V, B, H, W, alpha, dtype = 1_000_000, 8192, 32, 256, 1.15, jnp.float32
    else:
        V, B, H, W, alpha, dtype = 10_000_000, 65_536, 64, 256, 1.15, jnp.bfloat16
    V = (V // 8) * 8
    elem = jnp.dtype(dtype).itemsize

    cfg, idx_rm, _ = calibrate_powerlaw_workload(
        V, B, H, alpha, W, elem
    )
    print(f"cfg: {cfg}", flush=True)
    assert cfg is not None
    C, E, S_c, S_m, HEAD = (
        cfg.hot_rows, cfg.chunk_elems, cfg.cold_slots, cfg.mid_slots,
        cfg.mxu_head_rows,
    )
    GS = E // H
    N = B * H
    G = -(-N // E)
    acc_dt = jnp.float32

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
    idx = jnp.asarray(idx_rm.reshape(B, H))
    idx_bits = max(1, (V - 1).bit_length())
    gs_bits = max(1, (GS - 1).bit_length())
    uniform = 1.0

    def stage_fn(upto):
        def fn(table, indices, carry):
            i, dep = carry
            indices = indices + (dep * 0).astype(jnp.int32)
            flat = indices.reshape(-1).astype(jnp.int32)
            outs = []
            xi = flat.reshape(G, E)
            sm = jax.lax.broadcasted_iota(jnp.int32, (G, E), 1) // H
            key = jnp.where(xi < HEAD, 1, jnp.where(xi < C, 0, 2))
            cnt_mid = jnp.sum((key == 0).astype(jnp.int32), axis=1)
            cnt_cold = jnp.sum((key == 2).astype(jnp.int32), axis=1)
            outs.append(cnt_mid)
            if upto >= 1:
                comp = (((key << idx_bits) | xi) << gs_bits) | sm
                (comp,) = jax.lax.sort([comp], dimension=1, num_keys=1)
                s_s = comp & ((1 << gs_bits) - 1)
                x_s = (comp >> gs_bits) & ((1 << idx_bits) - 1)
                outs.append(x_s)

            def combine(rows, samples, live_coeff):
                onehot = (
                    samples[..., None] == jnp.arange(GS, dtype=jnp.int32)
                ).astype(acc_dt) * live_coeff[..., None]
                part = jax.lax.dot_general(
                    onehot, rows,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=acc_dt,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return part.reshape(G * GS, W)

            if upto >= 2:
                iota_m = jax.lax.broadcasted_iota(jnp.int32, (G, S_m), 1)
                m_live = iota_m < cnt_mid[:, None]
                m_idx = jnp.where(m_live, x_s[:, :S_m], 0)
                m_rows = jnp.take(table[:C], m_idx.reshape(-1), axis=0)
                outs.append(m_rows.reshape(G, S_m, W))
            if upto >= 3:
                m_cf = m_live.astype(acc_dt) * acc_dt(uniform)
                out = combine(m_rows.reshape(G, S_m, W), s_s[:, :S_m], m_cf)
                outs = [out]
            if upto >= 4:
                iota_c = jax.lax.broadcasted_iota(jnp.int32, (G, S_c), 1)
                c_live = iota_c >= (S_c - cnt_cold)[:, None]
                c_idx = jnp.where(c_live, x_s[:, E - S_c:], 0)
                c_rows = jnp.take(table, c_idx.reshape(-1), axis=0)
                outs.append(c_rows.reshape(G, S_c, W))
            if upto >= 5:
                c_cf = c_live.astype(acc_dt) * acc_dt(uniform)
                out = out + combine(
                    c_rows.reshape(G, S_c, W), s_s[:, E - S_c:], c_cf
                )
                outs = [out]
            if upto >= 6:
                coeff = jnp.ones(indices.shape, acc_dt)
                cols = jnp.arange(HEAD, dtype=jnp.int32)
                m = jnp.sum(
                    jnp.where(
                        indices[:, :, None] == cols[None, None, :],
                        coeff[:, :, None], 0,
                    ),
                    axis=1, dtype=acc_dt,
                )
                out = out[:B] + jax.lax.dot_general(
                    m, table[:HEAD],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt,
                    precision=jax.lax.Precision.HIGHEST,
                )
                outs = [out.astype(table.dtype)]
            dep2 = outs[-1].reshape(-1)[0].astype(jnp.float32)
            return ((i + 1, dep2), outs[-1])

        jfn = jax.jit(fn)
        return lambda carry: jfn(table, idx, carry)[0]

    prev = 0.0
    for k in range(7):
        dt = chain_time(stage_fn(k), (jnp.int32(0), jnp.float32(0)),
                        k_lo=1, k_hi=4, repeats=3)
        print(f"upto {k}: {dt*1e3:8.3f} ms   (marginal {1e3*(dt-prev):+8.3f})",
              flush=True)
        prev = dt

    # full production path for cross-check
    from cuembed_tpu.ops.tiered import tiered_forward
    from cuembed_tpu.types import CombineMode

    @jax.jit
    def full(table, indices, carry):
        i, dep = carry
        ind = indices + (dep * 0).astype(jnp.int32)
        out = tiered_forward(table, ind, mode=CombineMode.SUM, cfg=cfg)
        return (i + 1, out[0, 0].astype(jnp.float32))

    dt = chain_time(lambda c: full(table, idx, c),
                    (jnp.int32(0), jnp.float32(0)), k_lo=1, k_hi=4, repeats=3)
    print(f"tiered_forward (production): {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
