#!/usr/bin/env python
"""Multi-chip scaling benchmark: examples/s vs device count.

Measures the BASELINE.md north-star "examples/s scaling efficiency,
1 chip -> N devices" for the sharded embedding stack: row-sharded
tables with all-to-all index routing feeding a pooled combine, batch
scaled proportionally to the device count (weak scaling).

Runs on whatever devices are attached:
  * a real pod slice: JAX_PLATFORMS=tpu python benchmarks/scaling_benchmark.py
  * functional validation on a virtual mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python benchmarks/scaling_benchmark.py --per-device-batch 64

Prints one CSV line per device count: devices, examples/s, efficiency
vs the single-device rate.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-categories", type=int, default=1_000_000)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--hotness", type=int, default=32)
    p.add_argument("--per-device-batch", type=int, default=4096)
    p.add_argument("--alpha", type=float, default=1.15)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--train", action="store_true",
                   help="measure the full sparse train step (routed "
                        "forward + routed row-wise AdaGrad update) "
                        "instead of the forward alone")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cuembed_tpu.parallel import (
        alltoall_row_sharded_lookup,
        sharded_rowwise_adagrad_sparse_update,
    )
    from cuembed_tpu.utils.datagen import PowerLawGenerator

    all_devices = jax.devices()
    counts = [1]
    n = 2
    while n <= len(all_devices):
        counts.append(n)
        n *= 2

    V = args.num_categories
    gen = PowerLawGenerator(V - 1, args.hotness, args.alpha, seed=3)

    base_rate = None
    print("devices,examples_per_s,efficiency")
    for nd in counts:
        devs = all_devices[:nd]
        mesh = Mesh(np.array(devs), ("model",))
        rows = -(-V // nd) * nd
        table = jax.device_put(
            jnp.zeros((rows, args.width), jnp.float32),
            NamedSharding(mesh, P("model", None)),
        )
        batch = args.per_device_batch * nd
        idx = jax.device_put(
            jnp.asarray(gen.sample(batch).astype(np.int32)),
            NamedSharding(mesh, P("model", None)),
        )

        if args.train:
            accum = jax.device_put(
                jnp.zeros((rows,), jnp.float32),
                NamedSharding(mesh, P("model")),
            )

            import functools

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def tstep(table, accum, idx):
                pooled = alltoall_row_sharded_lookup(
                    table, idx, mesh=mesh
                )
                gy = jax.grad(
                    lambda q: jnp.sum(q.astype(jnp.float32) ** 2) * 1e-9
                )(pooled)
                return sharded_rowwise_adagrad_sparse_update(
                    table, accum, idx, gy, mesh=mesh, lr=1e-6
                )

            table, accum = tstep(table, accum, idx)  # compile + warm
            _ = float(jnp.sum(table[0, :1]))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                table, accum = tstep(table, accum, idx)
            _ = float(jnp.sum(table[0, :1]))
            dt = (time.perf_counter() - t0) / args.iters
            rate = batch / dt
        else:
            @jax.jit
            def step(table, idx, carry):
                i, dep = carry
                out = alltoall_row_sharded_lookup(
                    table, idx + (dep * 0).astype(jnp.int32), mesh=mesh
                )
                return (i + 1, out[0, 0].astype(jnp.float32))

            state = (jnp.int32(0), jnp.float32(0))
            state = step(table, idx, state)  # compile + warm
            _ = float(state[1])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state = step(table, idx, state)
            _ = float(state[1])
            dt = (time.perf_counter() - t0) / args.iters
            rate = batch / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        print(f"{nd},{rate:.0f},{eff:.3f}")


if __name__ == "__main__":
    main()
