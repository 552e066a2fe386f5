"""Shared MXU-head helpers for the tiered engine.

The same three pieces appear in the tiered forward, the custom_vjp
backward, and both sparse trainers: build the per-sample head matrix M
(one fused compare-reduce, no [N, head] materialization), contract it
against the head slice / grad_y on the MXU, and bound the post-sort
scatter width at the calibrated non-head capacity. Centralized so
mode-gating and capacity fixes land in one place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.tiered import TieredConfig


def head_matrix(indices2d: jax.Array, coeff2d: jax.Array, head: int, acc_dt):
    """M[b, c] = sum of coefficients of sample b's positions with index c.

    Built as a fused compare-reduce over ``[batch, hotness, head]`` —
    XLA never materializes the one-hot.
    """
    cols = jnp.arange(head, dtype=jnp.int32)
    idx2 = indices2d.astype(jnp.int32)
    return jnp.sum(
        jnp.where(
            idx2[:, :, None] == cols[None, None, :],
            coeff2d[:, :, None],
            0,
        ),
        axis=1,
        dtype=acc_dt,
    )


def head_grad(indices2d, coeff2d, grad_y, head: int, acc_dt) -> jax.Array:
    """``grad[:head] = M^T @ grad_y`` — the exact gradient of the head
    rows as one small matmul (full precision; TPU dots default to bf16)."""
    m = head_matrix(indices2d, coeff2d, head, acc_dt)
    return jnp.dot(
        m.T,
        grad_y.astype(acc_dt),
        preferred_element_type=acc_dt,
        precision=jax.lax.Precision.HIGHEST,
    )


def head_forward(indices2d, coeff2d, head_slice, head: int, acc_dt):
    """``out += M @ table[:head]`` — the forward head combine."""
    m = head_matrix(indices2d, coeff2d, head, acc_dt)
    return jnp.dot(
        m,
        head_slice.astype(acc_dt),
        preferred_element_type=acc_dt,
        precision=jax.lax.Precision.HIGHEST,
    )


def nonhead_capacity(cfg: TieredConfig, n: int) -> int:
    """Static bound on non-head positions after the sort (8-aligned).

    Derived from the calibrated mid+cold slot fractions; callers guard
    with a runtime count + ``lax.cond`` fallback to full width.
    """
    frac = min(1.0, (cfg.mid_slots + cfg.cold_slots) / cfg.chunk_elems)
    return min(n, -(-int(n * frac) // 8) * 8)
