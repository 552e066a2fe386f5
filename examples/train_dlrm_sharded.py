#!/usr/bin/env python
"""Multi-chip DLRM training demo: row-sharded tables over a device mesh.

The production multi-chip wiring on the cuembed_tpu stack (everything
the reference defers to "Future Release", ``README.md:110``):

  * embedding tables ROW-SHARDED over the mesh axis (``P(axis, None)``),
    batch data-parallel over the same axis,
  * forward served by the all-to-all router
    (:func:`cuembed_tpu.parallel.alltoall_row_sharded_lookup`) — indices
    bucketed by owner shard, two ``lax.all_to_all`` over ICI,
  * dense tower trained with ordinary autodiff (gradients ``psum`` via
    the shard_map transpose),
  * tables updated with the ROUTED sparse optimizer
    (:func:`cuembed_tpu.parallel.sharded_rowwise_adagrad_sparse_update`):
    (row, gradient row) pairs travel the same all-to-all wire to the
    owning shard; the AdaGrad accumulator is co-sharded with the table.
    No dense table gradient is ever materialized, on any shard.

Runs anywhere — on this box it uses the virtual 8-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_dlrm_sharded.py [--steps 10]

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
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--tables", type=int, default=4)
    p.add_argument("--categories", type=int, default=100_000)
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--hotness", type=int, default=8)
    p.add_argument("--alpha", type=float, default=1.15)
    p.add_argument("--lr", type=float, default=0.05)
    args = p.parse_args()

    import jax

    if jax.default_backend() == "cpu" and len(jax.devices()) < 2:
        print(
            "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
            "for a virtual mesh",
            file=sys.stderr,
        )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cuembed_tpu.models.dlrm import _bce_with_logits, _mlp_apply, _mlp_init
    from cuembed_tpu.parallel import (
        alltoall_row_sharded_lookup,
        pad_table_for_shards,
        sharded_rowwise_adagrad_sparse_update,
    )
    from cuembed_tpu.utils.datagen import PowerLawGenerator

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("model",))
    shard2d = NamedSharding(mesh, P("model", None))
    shard1d = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())

    names = [f"t{i}" for i in range(args.tables)]
    key = jax.random.key(0)
    tables, accums = {}, {}
    for i, n in enumerate(names):
        k = jax.random.fold_in(key, i)
        t = jax.random.uniform(
            k, (args.categories, args.width),
            minval=-args.width**-0.5, maxval=args.width**-0.5,
        )
        t = pad_table_for_shards(t, n_dev)
        tables[n] = jax.device_put(t, shard2d)
        accums[n] = jax.device_put(
            jnp.zeros((t.shape[0],), jnp.float32), shard1d
        )
    bottom = jax.device_put(
        _mlp_init(jax.random.key(1), (16, 64, args.width)), repl
    )
    n_feat = args.tables + 1
    top = jax.device_put(
        _mlp_init(
            jax.random.key(2), (args.width + n_feat * (n_feat - 1) // 2, 64, 1)
        ),
        repl,
    )

    gens = {
        n: PowerLawGenerator(
            args.categories - 1, args.hotness, args.alpha,
            seed=100 + i, permute=True,
        )
        for i, n in enumerate(names)
    }
    label_rng = np.random.default_rng(7)

    @jax.jit
    def train_step(tables, accums, bottom, top, dense, label, idx):
        pooled = {
            n: alltoall_row_sharded_lookup(
                jax.lax.stop_gradient(tables[n]), idx[n], mesh=mesh
            )
            for n in names
        }

        def dense_loss(dense_params, pooled):
            bot, tp = dense_params
            bottom_out = _mlp_apply(bot, dense)
            feats = jnp.stack(
                [bottom_out] + [pooled[n] for n in names], axis=1
            )
            inter = jnp.einsum(
                "bfd,bgd->bfg", feats, feats,
                preferred_element_type=jnp.float32,
            )
            f = feats.shape[1]
            iu, ju = jnp.triu_indices(f, k=1)
            top_in = jnp.concatenate([bottom_out, inter[:, iu, ju]], axis=1)
            logits = _mlp_apply(tp, top_in, final_linear=True)[:, 0]
            return jnp.mean(_bce_with_logits(logits, label))

        loss, (dgrads, pgrads) = jax.value_and_grad(
            dense_loss, argnums=(0, 1)
        )((bottom, top), pooled)
        new_bottom = jax.tree_util.tree_map(
            lambda q, g: q - args.lr * g, bottom, dgrads[0]
        )
        new_top = jax.tree_util.tree_map(
            lambda q, g: q - args.lr * g, top, dgrads[1]
        )
        for n in names:
            tables[n], accums[n] = sharded_rowwise_adagrad_sparse_update(
                tables[n], accums[n], idx[n], pgrads[n],
                mesh=mesh, lr=args.lr,
            )
        return tables, accums, new_bottom, new_top, loss

    t0 = time.perf_counter()
    for step in range(args.steps):
        dense = jax.device_put(
            label_rng.standard_normal((args.batch, 16)).astype(np.float32),
            shard2d,
        )
        label = jax.device_put(
            label_rng.integers(0, 2, args.batch).astype(np.float32), shard1d
        )
        idx = {
            n: jax.device_put(
                gens[n].sample(args.batch).astype(np.int32), shard2d
            )
            for n in names
        }
        tables, accums, bottom, top, loss = train_step(
            tables, accums, bottom, top, dense, label, idx
        )
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step:4d}  loss {float(loss):.4f}")
    dt = time.perf_counter() - t0
    print(
        f"{args.steps} steps on {n_dev} devices in {dt:.2f}s "
        f"({args.steps * args.batch / dt:.0f} examples/s)"
    )


if __name__ == "__main__":
    main()
