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


def head_matrix(indices2d: jax.Array, coeff2d, head: int, acc_dt,
                return_appeared: bool = False):
    """M[b, c] = sum of coefficients of sample b's positions with index c.

    Built as a fused compare-reduce over ``[batch, hotness, head]`` —
    XLA never materializes the one-hot. ``coeff2d=None`` means unit
    coefficients (M is then the pure occurrence-count matrix — one
    compare-reduce instead of compare+select).

    ``return_appeared=True`` additionally returns the ``[head]`` bool
    mask of head rows touched by ANY position — derived from the same
    compare (zero/cancelling weights still count as appearances), so
    weighted callers don't pay a second pass over the cube.
    """
    cols = jnp.arange(head, dtype=jnp.int32)
    idx2 = indices2d.astype(jnp.int32)
    hit = idx2[:, :, None] == cols[None, None, :]
    if coeff2d is None:
        m = jnp.sum(hit, axis=1, dtype=acc_dt)
        if return_appeared:
            return m, jnp.max(m, axis=0) > 0
        return m
    m = jnp.sum(
        jnp.where(hit, coeff2d[:, :, None], 0),
        axis=1,
        dtype=acc_dt,
    )
    if return_appeared:
        return m, jnp.any(hit, axis=(0, 1))
    return m


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
    frac = cfg.nonhead_frac
    if frac is None:
        frac = (cfg.mid_slots + cfg.cold_slots) / cfg.chunk_elems
    frac = min(1.0, frac)
    return min(n, -(-int(n * frac) // 8) * 8)


def tiered_backward_coo(
    grad_y: jax.Array,
    num_categories: int,
    indices2d: jax.Array,
    coeff2d: jax.Array,
    t_idx: jax.Array,
    t_sid: jax.Array,
    t_coeff: jax.Array,
    cfg: TieredConfig,
    *,
    backend: str = "auto",
) -> jax.Array:
    """Full-table gradient with the MXU head absorbing the hottest rows.

    The COO must be index-sorted with head positions (``idx <
    cfg.mxu_head_rows``) replaced by an int32-max sentinel *before* the
    sort (so they sort last) — the tiered analog of the reference's
    pre-sorted-COO backward contract (``cuembed/README.md:79``).
    ``grad[:head] = M^T @ grad_y`` lands as one matmul; the scatter-add
    only covers the calibrated non-head prefix (``lax.cond`` falls back
    to the full width when a batch overflows the calibration).

    Args:
      grad_y: ``[batch, width]`` upstream gradient (accumulation dtype).
      indices2d/coeff2d: the original ``[batch, hotness]`` lookup indices
        and per-position coefficients (for the head matrix).
      t_idx/t_sid/t_coeff: sentinel-masked, index-sorted COO.

    Returns ``[num_categories, width]`` gradient in ``grad_y.dtype``.
    """
    from cuembed_tpu.ops import dispatch

    head_rows = min(cfg.mxu_head_rows, num_categories)
    acc_dt = grad_y.dtype
    grad_head = head_grad(indices2d, coeff2d, grad_y, head_rows, acc_dt)

    nnz_cap = t_idx.shape[0]
    k_cap = nonhead_capacity(cfg, nnz_cap)

    def scatter(k):
        def f(_):
            return dispatch.backward(
                grad_y, num_categories, t_idx[:k], t_sid[:k],
                None if t_coeff is None else t_coeff[:k],
                nnz=None, backend=backend,
            )
        return f

    if k_cap >= nnz_cap:
        grad_table = scatter(nnz_cap)(0)
    else:
        sentinel = jnp.iinfo(jnp.int32).max
        rest_count = jnp.sum((t_idx != sentinel).astype(jnp.int32))
        grad_table = jax.lax.cond(
            rest_count <= k_cap, scatter(k_cap), scatter(nnz_cap), 0
        )
    return grad_table.at[:head_rows].add(grad_head)
