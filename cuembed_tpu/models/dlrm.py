"""DLRM-style recommender: sparse embedding bags + dense MLP towers.

The flagship model for the benchmark entrypoint and the multi-chip dry
run: multiple embedding tables (the cuEmbed workload), a bottom MLP over
dense features, pairwise-dot feature interaction, and a top MLP — the
standard shape of the recommender models the reference library serves.
Pure-functional (pytree params); MLPs run in bf16 on the MXU with fp32
accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cuembed_tpu.models.embedding_bag import EmbeddingBag
from cuembed_tpu.types import CombineMode


@dataclass(frozen=True)
class DLRMConfig:
    table_sizes: Tuple[int, ...] = (100_000,) * 8  # categories per table
    embed_width: int = 64
    hotness: int = 8
    dense_features: int = 16
    bottom_mlp: Tuple[int, ...] = (128, 64)
    top_mlp: Tuple[int, ...] = (256, 128, 1)
    embed_dtype: jnp.dtype = jnp.float32
    combine_mode: CombineMode = CombineMode.SUM
    #: store all tables as ONE fused physical table (base-offset ids):
    #: one lookup + one sparse update per step instead of num_tables
    #: dispatches — see :mod:`cuembed_tpu.fused`.
    fused: bool = False

    @property
    def num_tables(self) -> int:
        return len(self.table_sizes)


class DLRM:
    """init/apply/loss for the DLRM tower."""

    def __init__(self, config: DLRMConfig):
        self.config = config
        self.bags = [
            EmbeddingBag(v, config.embed_width, config.combine_mode, config.embed_dtype)
            for v in config.table_sizes
        ]
        self.fused_spec = None
        if config.fused:
            from cuembed_tpu.fused import FusedSpec

            names = tuple(f"t{i}" for i in range(config.num_tables))
            sizes = tuple(config.table_sizes)
            bases = []
            acc = 0
            for s in sizes:
                bases.append(acc)
                acc += s
            self.fused_spec = FusedSpec(
                names, tuple(bases), sizes,
                (config.hotness,) * config.num_tables,
                self.bags[0].stored_width, acc,
            )

    # -- params ----------------------------------------------------------
    def init(self, key: jax.Array) -> Dict:
        c = self.config
        keys = jax.random.split(key, c.num_tables + 2)
        tables = [bag.init(k) for bag, k in zip(self.bags, keys[: c.num_tables])]
        if self.fused_spec is not None:
            # one physical table; lookups offset ids by the table bases
            tables = jnp.concatenate(tables, axis=0)
        bottom = _mlp_init(keys[-2], (c.dense_features, *c.bottom_mlp))
        n_feat = c.num_tables + 1  # embedding outputs + bottom-MLP output
        inter_dim = c.bottom_mlp[-1] + n_feat * (n_feat - 1) // 2
        top = _mlp_init(keys[-1], (inter_dim, *c.top_mlp))
        return {"tables": tables, "bottom": bottom, "top": top}

    # -- forward ----------------------------------------------------------
    def apply(
        self,
        params: Dict,
        dense: jax.Array,  # [B, dense_features]
        sparse: Sequence[jax.Array],  # num_tables x [B, hotness]
        *,
        backend: str = "auto",
    ) -> jax.Array:
        c = self.config
        if c.bottom_mlp[-1] != c.embed_width:
            raise ValueError("bottom MLP output must equal embed_width")
        if self.fused_spec is not None:
            from cuembed_tpu.fused import fused_lookup

            spec = self.fused_spec
            out = fused_lookup(
                params["tables"], spec,
                dict(zip(spec.names, sparse)),
                mode=c.combine_mode, backend=backend,
            )
            emb = [out[n][:, : c.embed_width] for n in spec.names]
        else:
            emb = [
                bag.apply(t, idx, backend=backend)
                for bag, t, idx in zip(self.bags, params["tables"], sparse)
            ]
        bottom_out = _mlp_apply(params["bottom"], dense)  # [B, embed_width]
        feats = jnp.stack([bottom_out.astype(jnp.float32)] + [
            e.astype(jnp.float32) for e in emb
        ], axis=1)  # [B, F, D]
        # Pairwise dot interaction (upper triangle), MXU batched matmul.
        inter = jnp.einsum(
            "bfd,bgd->bfg", feats, feats, preferred_element_type=jnp.float32
        )
        f = feats.shape[1]
        iu, ju = jnp.triu_indices(f, k=1)
        inter_flat = inter[:, iu, ju]  # [B, F(F-1)/2]
        top_in = jnp.concatenate([bottom_out.astype(jnp.float32), inter_flat], axis=1)
        logits = _mlp_apply(params["top"], top_in, final_linear=True)
        return logits[:, 0]

    # -- loss / train step --------------------------------------------------
    def loss(self, params, dense, sparse, labels, *, backend: str = "auto"):
        logits = self.apply(params, dense, sparse, backend=backend)
        return jnp.mean(
            jax.nn.sigmoid_binary_cross_entropy(logits, labels)
            if hasattr(jax.nn, "sigmoid_binary_cross_entropy")
            else _bce_with_logits(logits, labels)
        )

    def sgd_step(self, params, dense, sparse, labels, lr=0.01, *, backend="auto"):
        loss, grads = jax.value_and_grad(
            lambda p: self.loss(p, dense, sparse, labels, backend=backend)
        )(params)
        new_params = jax.tree_util.tree_map(
            lambda p, g: (p - lr * g.astype(p.dtype)).astype(p.dtype), params, grads
        )
        return new_params, loss


def _bce_with_logits(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _mlp_init(key, dims: Sequence[int]) -> List[Dict]:
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        scale = (2.0 / dims[i]) ** 0.5
        layers.append(
            {
                "w": scale * jax.random.normal(sub, (dims[i], dims[i + 1]), jnp.float32),
                "b": jnp.zeros((dims[i + 1],), jnp.float32),
            }
        )
    return layers


def _mlp_apply(layers, x, final_linear: bool = False):
    x = x.astype(jnp.float32)
    for i, layer in enumerate(layers):
        # bf16 matmul on the MXU, fp32 accumulation.
        x = (
            jnp.dot(
                x.astype(jnp.bfloat16),
                layer["w"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            + layer["b"]
        )
        if not (final_linear and i == len(layers) - 1):
            x = jax.nn.relu(x)
    return x
