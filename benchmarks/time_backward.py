#!/usr/bin/env python
"""Time flagship compressed-backward variants (plain / tiered / capped)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.ops.lookup_xla import (
    embedding_backward_compressed_tiered,
    embedding_backward_compressed_xla,
)
from cuembed_tpu.utils.benchmarking import chain_time
from cuembed_tpu.utils.calibration import calibrate_powerlaw_workload


def main():
    V, B, H, W, alpha = 10_000_000, 65_536, 64, 256, 1.15
    V = (V // 8) * 8
    cfg, idx_rm, _ = calibrate_powerlaw_workload(
        V, B, H, alpha, W, 2, capacity_margin=1.05
    )
    print(f"cfg: {cfg}", flush=True)
    rng = np.random.default_rng(0)
    n = B * H
    flat = idx_rm.reshape(-1)
    head = cfg.mxu_head_rows
    SENT = np.iinfo(np.int32).max

    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    coeff2d = None  # unit coefficients
    idx2d = jnp.asarray(idx_rm.reshape(B, H))

    n_unique = np.unique(flat).size
    n_unique_nh = np.unique(flat[flat >= head]).size
    print(f"n_unique={n_unique} nonhead={n_unique_nh}", flush=True)
    u_cap = -(-int(n_unique_nh * 1.2) // 128) * 128

    def coo(mask_head):
        f = np.where(flat < head, SENT, flat) if mask_head else flat
        order = np.argsort(f, kind="stable")
        return (
            jnp.asarray(f[order].astype(np.int32)),
            jnp.asarray((np.arange(n, dtype=np.int32) // H)[order]),
            None,  # unweighted SUM: no coefficient operand
        )

    t_m = coo(True)
    t_p = coo(False)

    def run(name, fn, args):
        @jax.jit
        def step(gy, ti, ts, tw, carry):
            g = gy + carry * 0
            out = fn(g, ti, ts, tw)
            return out.rows[0, 0] + out.num_unique.astype(jnp.float32)

        dt = chain_time(lambda c: step(gy, *args, c), jnp.float32(0),
                        k_lo=1, k_hi=3, repeats=3)
        print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)

    run("plain compressed",
        lambda g, ti, ts, tw: embedding_backward_compressed_xla(g, ti, ts, tw),
        t_p)
    run("tiered compressed",
        lambda g, ti, ts, tw: embedding_backward_compressed_tiered(
            g, V, idx2d, coeff2d, ti, ts, tw, cfg),
        t_m)
    run(f"tiered compressed + unique_cap={u_cap}",
        lambda g, ti, ts, tw: embedding_backward_compressed_tiered(
            g, V, idx2d, coeff2d, ti, ts, tw, cfg, unique_cap=u_cap),
        t_m)


if __name__ == "__main__":
    main()
