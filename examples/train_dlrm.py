#!/usr/bin/env python
"""End-to-end DLRM training demo on the cuembed_tpu stack.

Shows the recommended production wiring:
  * EmbeddingCollection with per-table tiered configs,
  * frequency calibration + table reordering + host-side remap pipeline,
  * dense tower trained with ordinary autodiff, tables with row-sparse
    AdaGrad (no dense-gradient materialization),
  * background input pipeline (native C++ remap when built).

Runs on CPU or a TPU:  python examples/train_dlrm.py [--steps 20]
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
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--tables", type=int, default=4)
    p.add_argument("--categories", type=int, default=100_000)
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--hotness", type=int, default=8)
    p.add_argument("--alpha", type=float, default=1.15)
    p.add_argument("--lr", type=float, default=0.05)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuembed_tpu import EmbeddingCollection, TableConfig
    from cuembed_tpu.models.dlrm import _bce_with_logits, _mlp_apply, _mlp_init
    from cuembed_tpu.utils.datagen import PowerLawGenerator
    from cuembed_tpu.utils.pipeline import InputPipeline

    names = [f"t{i}" for i in range(args.tables)]
    coll = EmbeddingCollection(
        [
            TableConfig(n, args.categories, args.width, hotness=args.hotness)
            for n in names
        ]
    )
    key = jax.random.key(0)
    tables = coll.init(key)
    accums = coll.adagrad_init()
    bottom = _mlp_init(jax.random.key(1), (16, 64, args.width))
    n_feat = args.tables + 1
    top = _mlp_init(
        jax.random.key(2), (args.width + n_feat * (n_feat - 1) // 2, 64, 1)
    )

    gens = {
        n: PowerLawGenerator(
            args.categories - 1, args.hotness, args.alpha,
            seed=100 + i, permute=True,
        )
        for i, n in enumerate(names)
    }
    label_rng = np.random.default_rng(7)

    # Frequency calibration + reorder before training (production would
    # refresh this periodically from running counts).
    counts = coll.init_counts()
    for _ in range(4):
        counts = coll.update_counts(
            counts, {n: g.sample(args.batch) for n, g in gens.items()}
        )
    tables, remaps = coll.reorder(tables, counts)

    def source():
        return {
            "dense": label_rng.standard_normal((args.batch, 16)).astype(
                np.float32
            ),
            "label": label_rng.integers(0, 2, args.batch).astype(np.float32),
            **{n: g.sample(args.batch).astype(np.int32) for n, g in gens.items()},
        }

    @jax.jit
    def train_step(tables, accums, bottom, top, batch):
        idx = {n: batch[n] for n in names}
        pooled = coll.apply(
            {n: jax.lax.stop_gradient(tables[n]) for n in names}, idx
        )

        def dense_loss(dense_params, pooled):
            bot, tp = dense_params
            bottom_out = _mlp_apply(bot, batch["dense"])
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
            return jnp.mean(_bce_with_logits(logits, batch["label"]))

        (loss, (dgrads, pgrads)) = jax.value_and_grad(
            dense_loss, argnums=(0, 1)
        )((bottom, top), pooled)
        new_bottom = jax.tree_util.tree_map(
            lambda p, g: p - args.lr * g, bottom, dgrads[0]
        )
        new_top = jax.tree_util.tree_map(
            lambda p, g: p - args.lr * g, top, dgrads[1]
        )
        tables, accums = coll.adagrad_update(
            tables, accums, idx, pgrads, lr=args.lr
        )
        return tables, accums, new_bottom, new_top, loss

    def put(batch):
        import jax as _jax

        return {k: _jax.device_put(v) for k, v in batch.items()}

    with InputPipeline(
        source, remap={n: remaps[n] for n in names}, depth=2, device_put=put
    ) as pipe:
        t0 = time.perf_counter()
        for step in range(args.steps):
            batch = pipe.get()
            tables, accums, bottom, top, loss = train_step(
                tables, accums, bottom, top, batch
            )
            if step % 5 == 0 or step == args.steps - 1:
                print(f"step {step:4d}  loss {float(loss):.4f}")
        dt = time.perf_counter() - t0
    print(
        f"{args.steps} steps in {dt:.2f}s "
        f"({args.steps * args.batch / dt:.0f} examples/s)"
    )


if __name__ == "__main__":
    main()
