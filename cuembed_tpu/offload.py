"""Host-offloaded embedding table: device hot head + host-RAM cold tail.

Serves tables LARGER THAN HBM — the capacity story the GPU world covers
with UVM/managed memory (the reference's tables are caller-owned device
pointers and must fit the GPU). TPU-native shape of the idea:

* rows ``[0, hot)`` — frequency-ordered hot head — live on device and
  serve the bulk of power-law traffic at device gather rate;
* rows ``[hot, V)`` stay in host RAM. Per batch, the host gathers the
  *unique* cold rows the batch actually touches (`prepare`, designed to
  run in the input pipeline's background thread —
  :mod:`cuembed_tpu.utils.pipeline`) and ships them with the batch:
  ``O(unique_cold * width)`` host->device bytes per step, independent of
  the tail size.
* the device lookup combines head gathers with the shipped rows; the
  sparse updates split the same way — head rows update on device, cold
  per-unique-row gradients ship back and apply to the host array.

Exactness: identical to a single device-resident table (tested); the
hot/cold split is a placement, not an approximation. Overflowing the
static ``cold_cap`` raises at `prepare` time on the host — size it from
the calibrated cold fraction (:func:`cuembed_tpu.utils.frequency.
tier_fractions`) with margin.
"""

from __future__ import annotations

import threading

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.types import CombineMode


@dataclass(frozen=True)
class OffloadBatch:
    """One prepared batch: device-ready indices + shipped cold rows."""

    idx_hot: jax.Array        # [B, H] ids clamped to 0 where cold
    slot_of_pos: jax.Array    # [B, H] index into cold_rows (0 where hot)
    is_cold: jax.Array        # [B, H] bool
    cold_rows: jax.Array      # [cold_cap, W] shipped tail rows
    uniq_cold: np.ndarray     # [n_cold] HOST tail-relative unique rows
    weights: Optional[jax.Array] = None


@partial(jax.jit, static_argnames=("mode",))
def _offload_lookup(head, idx_hot, slot_of_pos, is_cold, cold_rows,
                    weights, mode):
    from cuembed_tpu.types import combine_coefficients

    b, h = idx_hot.shape
    flat_hot = idx_hot.reshape(-1)
    rows_h = jnp.take(head, flat_hot, axis=0).astype(jnp.float32)
    rows_c = jnp.take(cold_rows, slot_of_pos.reshape(-1), axis=0).astype(
        jnp.float32
    )
    rows = jnp.where(is_cold.reshape(-1)[:, None], rows_c, rows_h)
    coeff = combine_coefficients(weights, mode, b, h)
    out = jnp.sum((rows * coeff[:, None]).reshape(b, h, -1), axis=1)
    return out.astype(head.dtype)


@partial(jax.jit, static_argnames=("mode", "cap"))
def _split_grads(idx_hot, slot_of_pos, is_cold, grad_y, weights, mode, cap):
    """Per-position gradient rows split into (head coeffs, cold sums)."""
    from cuembed_tpu.types import combine_coefficients

    b, h = idx_hot.shape
    coeff = combine_coefficients(weights, mode, b, h)
    flat_cold = is_cold.reshape(-1)
    gy_rows = jnp.repeat(
        grad_y.astype(jnp.float32), h, axis=0
    )  # [b*h, W]
    cold_grads = jax.ops.segment_sum(
        gy_rows * jnp.where(flat_cold, coeff, 0.0)[:, None],
        slot_of_pos.reshape(-1),
        num_segments=cap,
    )  # [cap, W] summed per unique cold row
    head_coeff = jnp.where(flat_cold, 0.0, coeff).reshape(b, h)
    return head_coeff, cold_grads


class HostOffloadTable:
    """Stateful wrapper: device head array + host numpy tail.

    ``table`` must be frequency-ordered (hot categories in the lowest
    rows — :mod:`cuembed_tpu.utils.frequency`); ids at lookup time are
    the remapped rows, exactly like the tiered engine's contract.
    """

    def __init__(
        self,
        table: np.ndarray,
        hot_rows: int,
        *,
        cold_cap: int = 4096,
        device_dtype=None,
    ):
        table = np.asarray(table)
        if not 0 < hot_rows < table.shape[0]:
            raise ValueError("need 0 < hot_rows < num_categories")
        self.num_categories, self.width = table.shape
        self.hot = int(hot_rows)
        self.cold_cap = int(cold_cap)
        self.head = jnp.asarray(
            table[: self.hot],
            dtype=device_dtype or table.dtype,
        )
        # fp32 host master for exact accumulation regardless of the
        # device serving dtype
        self.tail = table[self.hot:].astype(np.float32).copy()
        self.tail_accum: Optional[np.ndarray] = None  # AdaGrad state
        self.head_accum: Optional[jax.Array] = None
        # prepare() may run on the input-pipeline thread while training
        # updates mutate the tail on the main thread; the lock keeps a
        # shipped row from being read mid-update (torn floats). Held for
        # the gather / the scatter only — microseconds at typical caps.
        self._tail_lock = threading.Lock()

    # -- host side (input-pipeline thread) ------------------------------
    def prepare(self, indices: np.ndarray, weights=None) -> OffloadBatch:
        """Gather this batch's unique cold rows from the host tail.

        Served by the multithreaded C++ kernel when built
        (``native/cuembed_host.cpp:cuembed_offload_prepare``); numpy
        fallback otherwise — identical semantics either way.
        """
        from cuembed_tpu import native

        with self._tail_lock:
            idx_hot, slot, is_cold, uniq, rows = native.offload_prepare(
                np.asarray(indices), self.hot, self.tail, self.cold_cap
            )
        return OffloadBatch(
            idx_hot=jnp.asarray(idx_hot),
            slot_of_pos=jnp.asarray(slot),
            is_cold=jnp.asarray(is_cold),
            cold_rows=jnp.asarray(rows.astype(self.head.dtype)),
            uniq_cold=uniq,
            weights=None if weights is None else jnp.asarray(weights),
        )

    # -- device side -----------------------------------------------------
    def lookup(
        self, batch: OffloadBatch, *, mode: CombineMode = CombineMode.SUM
    ) -> jax.Array:
        if mode == CombineMode.CONCAT:
            raise ValueError("offload pools rows; CONCAT unsupported")
        if batch.weights is not None and mode != CombineMode.SUM:
            raise ValueError("weights are only supported with SUM")
        return _offload_lookup(
            self.head, batch.idx_hot, batch.slot_of_pos, batch.is_cold,
            batch.cold_rows, batch.weights, mode,
        )

    # -- training --------------------------------------------------------
    def sgd_update(
        self,
        batch: OffloadBatch,
        grad_y: jax.Array,
        *,
        lr: float,
        mode: CombineMode = CombineMode.SUM,
    ) -> None:
        """Sparse SGD: head on device, shipped-back cold rows on host."""
        from cuembed_tpu.train import sgd_sparse_update

        head_coeff, cold_grads = _split_grads(
            batch.idx_hot, batch.slot_of_pos, batch.is_cold, grad_y,
            batch.weights, mode, self.cold_cap,
        )
        self.head = sgd_sparse_update(
            self.head, batch.idx_hot, grad_y, lr=lr, weights=head_coeff,
            mode=CombineMode.SUM,
        )
        k = batch.uniq_cold.shape[0]
        g = np.asarray(cold_grads)[:k]
        with self._tail_lock:
            self.tail[batch.uniq_cold] -= lr * g

    def adagrad_init(self) -> None:
        self.head_accum = jnp.zeros((self.hot,), jnp.float32)
        self.tail_accum = np.zeros(
            (self.num_categories - self.hot,), np.float32
        )

    def adagrad_update(
        self,
        batch: OffloadBatch,
        grad_y: jax.Array,
        *,
        lr: float,
        eps: float = 1e-8,
        mode: CombineMode = CombineMode.SUM,
    ) -> None:
        """Row-wise AdaGrad, state co-located with each part."""
        from cuembed_tpu.train import rowwise_adagrad_sparse_update

        if self.head_accum is None or self.tail_accum is None:
            raise ValueError("call adagrad_init() first")
        head_coeff, cold_grads = _split_grads(
            batch.idx_hot, batch.slot_of_pos, batch.is_cold, grad_y,
            batch.weights, mode, self.cold_cap,
        )
        self.head, self.head_accum = rowwise_adagrad_sparse_update(
            self.head, self.head_accum, batch.idx_hot, grad_y, lr=lr,
            eps=eps, weights=head_coeff, mode=CombineMode.SUM,
        )
        k = batch.uniq_cold.shape[0]
        g = np.asarray(cold_grads)[:k]
        with self._tail_lock:
            acc = self.tail_accum[batch.uniq_cold] + np.mean(g * g, axis=1)
            self.tail_accum[batch.uniq_cold] = acc
            self.tail[batch.uniq_cold] -= (
                lr * g / np.sqrt(acc + eps)[:, None]
            )

    # -- export ----------------------------------------------------------
    def full_table(self) -> np.ndarray:
        """Logical [V, W] fp32 copy (head downloaded + host tail)."""
        return np.concatenate(
            [np.asarray(self.head, dtype=np.float32), self.tail]
        )
