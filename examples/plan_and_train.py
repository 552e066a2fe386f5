#!/usr/bin/env python
"""Planner-driven multi-table training: calibrate -> plan -> train.

The full production placement workflow on the cuembed_tpu stack:

  1. describe the tables (:class:`cuembed_tpu.collection.TableConfig`),
  2. collect frequency statistics from real traffic
     (``EmbeddingCollection.update_counts``),
  3. let the placement planner choose per table — replicated /
     row-sharded / hybrid / column-sharded — from the measured cost
     model (``EmbeddingCollection.plan_placement`` ->
     :mod:`cuembed_tpu.parallel.planner`),
  4. place the tables (``apply_plan``) and train with the placement-
     aware lookup + sparse AdaGrad (``planned_lookup`` /
     ``planned_adagrad_update``) — every table takes its own optimal
     path, no dense table gradient anywhere.

Runs anywhere — on this box it uses the virtual 8-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/plan_and_train.py [--steps 5]

On a real pod slice the same code runs unchanged over the ICI mesh.
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
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cuembed_tpu.collection import EmbeddingCollection, TableConfig
    from cuembed_tpu.parallel import (
        CostModel,
        apply_plan,
        planned_adagrad_init,
        planned_adagrad_update,
        planned_lookup,
    )
    from cuembed_tpu.utils.datagen import PowerLawGenerator

    n = min(8, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n]), ("model",))
    B = args.batch - args.batch % n or n

    # 1. Table configs: one small (will replicate), one big uniform
    #    (row-sharded), one big skewed (hybrid once stats prove it).
    configs = [
        TableConfig("genre", 512, 32, hotness=2, traffic_share=1.0),
        TableConfig("item", 200_000, 32, hotness=4, traffic_share=1.0),
        TableConfig("user", 200_000, 32, hotness=4, traffic_share=2.0),
    ]
    coll = EmbeddingCollection(configs)

    # 2. Frequency statistics from calibration traffic.
    # ids land in [1, V-1] (the generator reserves 0 for "missing",
    # matching the reference's datagen contract, datagen.h:89-96)
    gens = {
        "genre": PowerLawGenerator(511, 2, 0.0, seed=1),
        "item": PowerLawGenerator(199_999, 4, 0.0, seed=2),   # uniform
        "user": PowerLawGenerator(199_999, 4, 1.3, seed=3),   # skewed
    }
    # Enough calibration volume that distinct-category counts exceed the
    # candidate head sizes — head_hit_rates refuses to judge skew from
    # a sample too small to distinguish uniform from zipf.
    counts = coll.init_counts()
    for _ in range(16):
        counts = coll.update_counts(
            counts, {k: g.sample(4096) for k, g in gens.items()}
        )

    # 3. Plan: demo-sized cost model so all strategies appear at toy
    #    scale (production uses the measured v5e defaults).
    plan = coll.plan_placement(
        n,
        batch=65536,
        counts=counts,
        cost=CostModel(replicate_bytes_max=1 << 20),
        hot_bytes_total=8 << 20,
    )
    print(plan.summary())

    # 4. Frequency-order the hybrid tables and place everything.
    tables = coll.init(jax.random.key(0))
    hybrid = [
        t.name for t in plan.tables.values() if t.placement == "hybrid"
    ]
    remaps = {}
    if hybrid:
        tables_r, remaps_all = coll.reorder(tables, counts)
        tables.update({k: tables_r[k] for k in hybrid})
        remaps = {k: remaps_all[k] for k in hybrid}
    placed = apply_plan(plan, tables, mesh)
    accums = planned_adagrad_init(plan, placed, mesh)

    batch_sh = NamedSharding(mesh, P("model", None))
    for step in range(args.steps):
        idx = {}
        for k, g in gens.items():
            raw = g.sample(B).astype(np.int32)
            if k in remaps:  # id remap belongs in the input pipeline
                raw = remaps[k][raw]
            idx[k] = jax.device_put(jnp.asarray(raw), batch_sh)
        t0 = time.perf_counter()
        pooled = planned_lookup(plan, placed, idx, mesh=mesh)
        # toy loss: L2 on the pooled embeddings => grad_y = 2 * pooled
        gys = {k: 2.0 * v for k, v in pooled.items()}
        placed, accums = planned_adagrad_update(
            plan, placed, accums, idx, gys, mesh=mesh, lr=0.05
        )
        jax.block_until_ready(jax.tree.leaves(placed))
        norm = sum(
            float(jnp.sum(x.astype(jnp.float32) ** 2))
            for v in pooled.values()
            for x in [v]
        )
        print(
            f"step {step}: pooled-norm {norm:10.1f}  "
            f"({(time.perf_counter() - t0) * 1e3:.1f} ms)"
        )
    print("done — placements:",
          {t.name: t.placement for t in plan.tables.values()})


if __name__ == "__main__":
    main()
