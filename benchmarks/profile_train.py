#!/usr/bin/env python
"""Profile flagship train steps (sparse SGD / row-wise AdaGrad) op-by-op.

Attributes the wall-clock vs device-time gap the round-2 review flagged
(AdaGrad 130 ms wall, ~73 ms device): prints the trace's per-op device
totals next to the measured wall time per dispatch, so host/dispatch/
donation overhead is separated from real device work. Run on the chip:

    python benchmarks/profile_train.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import glob
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def dump_plane(xplane_path, label, n_steps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xplane_path, "rb").read())
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        md = {k: v.name for k, v in p.event_metadata.items()}
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in p.lines:
            if "XLA" not in line.name:
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        dev_total = sum(tot.values()) / n_steps
        print(f"--- {label}: device {dev_total:.1f} ms/step ---")
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{ms / n_steps:9.3f} ms  x{cnt[name]:<3d} {name[:110]}",
                  flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
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

    if args.quick:
        V, B, H, W, dtype = 1_000_000, 8192, 32, 256, jnp.float32
    else:
        V, B, H, W, dtype = 10_000_000, 65_536, 64, 256, jnp.bfloat16
    alpha = 1.15

    gen = PowerLawGenerator(V - 1, H, alpha, seed=7, permute=True)
    idx_raw = gen.sample(B).astype(np.int32)
    cfg0 = auto_config(V, W, jnp.dtype(dtype).itemsize, H)
    cfg, idx, unique_cap = None, jnp.asarray(idx_raw), None
    if cfg0 is not None:
        counts = None
        for i in range(8):
            counts = count_frequencies(gen.sample(B), V, counts)
        _, remap = frequency_order(counts)
        hf, cf = tier_fractions(gen.sample(B), remap, cfg0.mxu_head_rows,
                                cfg0.hot_rows, margin=1.15)
        cfg = auto_config(V, W, jnp.dtype(dtype).itemsize, H,
                          cold_fraction=cf, head_fraction=hf)
        idx_rm = remap[idx_raw]
        idx = jnp.asarray(idx_rm)
        nonhead = idx_rm[idx_rm >= cfg.mxu_head_rows]
        unique_cap = int(np.unique(nonhead).size * 1.2) // 8 * 8 + 8

    def fake_grad_y(pooled):
        return jax.grad(
            lambda q: jnp.sum(q.astype(jnp.float32) ** 2) * 1e-9
        )(pooled)

    @functools.partial(jax.jit, donate_argnums=0)
    def step_sparse(table, idx):
        pooled = embedding_lookup(
            jax.lax.stop_gradient(table), idx,
            backend="tiered" if cfg else "xla", tiered_cfg=cfg,
        )
        return sgd_sparse_update(
            table, idx, fake_grad_y(pooled), lr=1e-6, tiered_cfg=cfg,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_adagrad(table, accum, idx):
        pooled = embedding_lookup(
            jax.lax.stop_gradient(table), idx,
            backend="tiered" if cfg else "xla", tiered_cfg=cfg,
        )
        return rowwise_adagrad_sparse_update(
            table, accum, idx, fake_grad_y(pooled), lr=1e-6,
            tiered_cfg=cfg, unique_cap=unique_cap,
        )

    N_PROF = 3

    def profile(label, step, state):
        for _ in range(2):  # compile + warm
            state = step(state)
        leaf = jax.tree_util.tree_leaves(state)[0]
        _ = float(jnp.sum(leaf[0, :1].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(N_PROF):
            state = step(state)
        leaf = jax.tree_util.tree_leaves(state)[0]
        _ = float(jnp.sum(leaf[0, :1].astype(jnp.float32)))
        wall = (time.perf_counter() - t0) / N_PROF
        tdir = tempfile.mkdtemp(prefix=f"trainprof_{label}_")
        with jax.profiler.trace(tdir):
            for _ in range(N_PROF):
                state = step(state)
            leaf = jax.tree_util.tree_leaves(state)[0]
            _ = float(jnp.sum(leaf[0, :1].astype(jnp.float32)))
        print(f"=== {label}: wall {wall * 1e3:.1f} ms/step "
              f"(per-dispatch, includes host/tunnel overhead)")
        xp = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
        if xp:
            dump_plane(xp[0], label, N_PROF)
        del state

    table0 = jax.block_until_ready(jnp.zeros((V, W), dtype))
    profile("sparse_sgd", lambda t: step_sparse(t, idx), table0)
    table0 = jax.block_until_ready(jnp.zeros((V, W), dtype))
    accum = rowwise_adagrad_init(V)
    profile("adagrad", lambda s: step_adagrad(s[0], s[1], idx),
            (table0, accum))


if __name__ == "__main__":
    main()
