#!/usr/bin/env python
"""Training-step benchmark: sparse vs dense embedding updates on one chip.

Measures full train-step latency (forward + gradient + table update) for
the flagship-scale workload under three regimes:

  * dense:   jax.grad through the lookup + SGD on the dense gradient
             (the naive contract — materializes a [V, W] fp32 gradient)
  * sparse:  split backward at the pooled embeddings + sorted sparse SGD
  * adagrad: sparse row-wise AdaGrad (the production DLRM optimizer)

Usage:  python benchmarks/train_benchmark.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--chained", action="store_true",
                   help="time k steps chained inside ONE jit call "
                        "(amortizes per-call dispatch; production regime)")
    p.add_argument("--num-categories", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--hotness", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuembed_tpu import embedding_lookup
    from cuembed_tpu.ops.tiered import auto_config
    from cuembed_tpu.train import (
        rowwise_adagrad_init,
        rowwise_adagrad_sparse_update,
        sgd_sparse_update,
    )
    from cuembed_tpu.utils.datagen import PowerLawGenerator
    from cuembed_tpu.utils.frequency import (
        count_frequencies,
        frequency_order,
        tier_fractions,
    )
    from cuembed_tpu import native as ce_native

    if args.quick:
        V, B, H, W, dtype = 1_000_000, 8192, 32, 256, jnp.float32
    else:
        V, B, H, W, dtype = 10_000_000, 65_536, 64, 256, jnp.bfloat16
    V = args.num_categories or V
    B = args.batch or B
    H = args.hotness or H
    W = args.width or W
    alpha = 1.15

    table0 = jax.block_until_ready(jnp.zeros((V, W), dtype))
    gen = PowerLawGenerator(V - 1, H, alpha, seed=7, permute=True)
    idx_raw = gen.sample(B).astype(np.int32)

    cfg0 = auto_config(V, W, jnp.dtype(dtype).itemsize, H)
    cfg, idx, unique_cap = None, jnp.asarray(idx_raw), None
    if cfg0 is not None:
        counts = None
        for i in range(16):
            calib = (
                ce_native.powerlaw_indices(
                    V - 1, H, alpha, B, seed=900 + i,
                    permutation=gen.permutation)
                if ce_native.AVAILABLE else gen.sample(B)
            )
            counts = count_frequencies(calib, V, counts)
        _, remap = frequency_order(counts)
        hf, cf = tier_fractions(gen.sample(B), remap, cfg0.mxu_head_rows,
                                cfg0.hot_rows, margin=1.15)
        cfg = auto_config(V, W, jnp.dtype(dtype).itemsize, H,
                          cold_fraction=cf, head_fraction=hf)
        idx_rm = remap[idx_raw]
        idx = jnp.asarray(idx_rm)
        # calibrate the per-batch unique non-head row count (+20%)
        nonhead = idx_rm[idx_rm >= cfg.mxu_head_rows]
        unique_cap = int(np.unique(nonhead).size * 1.2) // 8 * 8 + 8

    def fake_grad_y(pooled):
        return jax.grad(
            lambda p: jnp.sum(p.astype(jnp.float32) ** 2) * 1e-9
        )(pooled)

    @functools.partial(jax.jit, donate_argnums=0)
    def step_dense(table, idx):
        def loss(t):
            out = embedding_lookup(t, idx, backend="xla")
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9
        g = jax.grad(loss)(table)
        return (table - 1e-6 * g.astype(table.dtype)).astype(table.dtype)

    @functools.partial(jax.jit, donate_argnums=0, static_argnames="overflow")
    def step_sparse(table, idx, overflow="fallback"):
        pooled = embedding_lookup(
            jax.lax.stop_gradient(table), idx,
            backend="tiered" if cfg else "xla", tiered_cfg=cfg,
        )
        return sgd_sparse_update(
            table, idx, fake_grad_y(pooled), lr=1e-6, tiered_cfg=cfg,
            overflow=overflow,
        )

    @functools.partial(
        jax.jit, donate_argnums=(0, 1), static_argnames="overflow"
    )
    def step_adagrad(table, accum, idx, overflow="fallback"):
        pooled = embedding_lookup(
            jax.lax.stop_gradient(table), idx,
            backend="tiered" if cfg else "xla", tiered_cfg=cfg,
        )
        return rowwise_adagrad_sparse_update(
            table, accum, idx, fake_grad_y(pooled), lr=1e-6, tiered_cfg=cfg,
            unique_cap=unique_cap, overflow=overflow,
        )

    def time_steps_chained(name, body, state):
        """Per-step time with k steps chained INSIDE one jit call.

        One dispatch per k steps (lax.fori_loop over the step body), so
        per-call host/tunnel dispatch cost is amortized away — the
        production regime, where steps run back-to-back from an input
        queue and dispatch overlaps device compute. The k=1 vs k=4 delta
        isolates pure device time per step (chain_time's methodology);
        the standard `time_steps` numbers above it include the per-call
        dispatch tax and bound the host-side overhead from above.
        """
        # idx enters as a jit ARGUMENT (closure capture would bake the
        # ~17 MB device array into the HLO as a constant — the pattern
        # bench.py/manual_benchmark.py forbid).
        def run_k(state, idx, k):
            return jax.lax.fori_loop(0, k, lambda _, s: body(s, idx), state)

        jit_k = jax.jit(run_k, donate_argnums=0, static_argnums=2)

        # compile both ks + warm
        for k in (1, 4):
            state = jit_k(state, idx, k)
        leaf = jax.tree_util.tree_leaves(state)[0]
        _ = float(jnp.sum(leaf[0, :1].astype(jnp.float32)))
        best = None
        for _ in range(max(2, args.iters)):
            t0 = time.perf_counter()
            state = jit_k(state, idx, 1)
            leaf = jax.tree_util.tree_leaves(state)[0]
            _ = float(jnp.sum(leaf[0, :1].astype(jnp.float32)))
            t1 = time.perf_counter()
            state = jit_k(state, idx, 4)
            leaf = jax.tree_util.tree_leaves(state)[0]
            _ = float(jnp.sum(leaf[0, :1].astype(jnp.float32)))
            t2 = time.perf_counter()
            dt = ((t2 - t1) - (t1 - t0)) / 3
            best = dt if best is None else min(best, dt)
        print(f"{name:8s}: {best*1e3:8.2f} ms/step "
              f"({B / best:,.0f} examples/s)  [on-device chained]")
        del state

    def time_steps(name, step, state):
        def run(state, k):
            t0 = time.perf_counter()
            for _ in range(k):
                state = step(state)
            leaf = jax.tree_util.tree_leaves(state)[0]
            _ = float(jnp.sum(leaf[0, :1].astype(jnp.float32)))
            return time.perf_counter() - t0, state

        _, state = run(state, 2)  # compile + warm
        t1, state = run(state, 1)
        tk, state = run(state, args.iters)
        dt = (tk - t1) / max(1, args.iters - 1)
        print(f"{name:8s}: {dt*1e3:8.2f} ms/step "
              f"({B / dt:,.0f} examples/s)")
        del state

    if args.chained:
        time_steps_chained(
            "sparse", lambda t, ix: step_sparse(t, ix), table0
        )
        table0 = jax.block_until_ready(jnp.zeros((V, W), dtype))
        accum = rowwise_adagrad_init(V)
        time_steps_chained(
            "adagrad",
            lambda s, ix: step_adagrad(s[0], s[1], ix),
            (table0, accum),
        )
        return

    time_steps("sparse", lambda t: step_sparse(t, idx), table0)
    table0 = jax.block_until_ready(jnp.zeros((V, W), dtype))
    time_steps("sparse-drop",
               lambda t: step_sparse(t, idx, overflow="drop"), table0)
    table0 = jax.block_until_ready(jnp.zeros((V, W), dtype))
    accum = rowwise_adagrad_init(V)
    time_steps(
        "adagrad",
        lambda s: step_adagrad(s[0], s[1], idx),
        (table0, accum),
    )
    table0 = jax.block_until_ready(jnp.zeros((V, W), dtype))
    accum = rowwise_adagrad_init(V)
    time_steps(
        "ada-drop",
        lambda s: step_adagrad(s[0], s[1], idx, overflow="drop"),
        (table0, accum),
    )
    table0 = jax.block_until_ready(jnp.zeros((V, W), dtype))
    time_steps("dense", lambda t: step_dense(t, idx), table0)


if __name__ == "__main__":
    main()
