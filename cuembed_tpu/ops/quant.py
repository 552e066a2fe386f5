"""Opt-in int8 hot head: larger VMEM coverage at a stated, bounded error.

The tiered engine's mid tier serves rows from a VMEM-resident head slice
whose size is capped by the ~108 MB placement budget
(``ops/tiered.py``). Storing that slice as per-row symmetric int8 fits
``elem * W / (W + 128)`` times more rows in the same bytes (the 128-lane
scale pad is forced by int8 tiling): 1.33x for bf16 / 2.67x for f32 at
W=256, approaching 2x / 4x for wide rows. That moves the extra rows'
traffic from the HBM descriptor-rate cold tier (~13 ns/row) to the VMEM
tier (~3.2 ns/row). This is the one remaining distribution-level lever
on v5e identified by the round-2 profiling (docs/PERF_NOTES.md): the
gathers are descriptor-bound, so only a larger VMEM-served fraction —
not faster bytes — buys anything.

Layout: ``[rows, width + 128]`` int8 — columns ``[0, width)`` hold the
quantized values, the first 4 bytes of the 128-lane pad hold the f32
scale (bitcast), so ONE gather fetches value row and scale together (a
separate per-slot scale gather would cost ~12-17 ms at flagship scale —
1-wide gathers run at ~150-200 M elem/s). The dequant multiply rides the
one-hot combine coefficient (``coeff * scale`` per slot), so the only
extra stream work is the int8->bf16 convert that feeds the MXU dot.

Numerics (documented bound, tested in tests/test_quant.py): per-row
symmetric quantization with ``scale = max|row| / 127`` gives elementwise
error ``<= scale/2 = max|row|/254`` (~0.2% of the row's max-abs). A
pooled SUM over ``h`` mid-tier hits errs at most
``sum_hits max|row_i|/254``. This mode is opt-in and lossy — the exact
path stays the default, and the bitwise-parity suite never routes
through it. Forward/serving only: gradients do not flow through the
quantized copy (train against the exact table, refresh the head
periodically like any serving cache).

The reference has no quantized mode; this matches its speed-of-light
framing (``README.md:4``) on a chip whose "L2" (VMEM) must be managed
explicitly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cuembed_tpu.types import CombineMode

LANES = 128


class QuantizedHead(NamedTuple):
    """Int8 head slice with inline per-row scales (see module doc)."""

    data: jax.Array  # [rows, width + 128] int8

    @property
    def rows(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1] - LANES


def int8_head_rows(width: int, hot_bytes: int) -> int:
    """How many head rows fit the VMEM budget in the int8 layout."""
    return max(8, hot_bytes // (width + LANES)) // 8 * 8


@jax.custom_jvp
def serving_only_guard(x: jax.Array) -> jax.Array:
    """Identity that refuses differentiation.

    Every int8-quantized serving path (the VMEM head here, the
    compressed all-to-all payload in :mod:`cuembed_tpu.parallel`) has a
    quantization round whose gradient is zero everywhere, so ``jax.grad``
    through it would *silently* drop part of the table gradient while
    the exact-path part still flows — easy to miss. Fail loudly at trace
    time instead: these modes are forward/serving only.
    """
    return x


@serving_only_guard.defjvp
def _serving_only_guard_jvp(primals, tangents):
    raise NotImplementedError(
        "int8-quantized lookups are a forward/serving-only mode: the "
        "quantization round is not differentiable and jax.grad would "
        "silently zero the quantized rows' table gradient. Train against "
        "the exact path (no q_head / compress='none')."
    )


def quantize_rows(rows: jax.Array, pad: int = 4) -> jax.Array:
    """Per-row symmetric int8 with the f32 scale inline: [m, W] -> [m, W+pad].

    ``scale = max|row| / 127`` bitcast into the first 4 pad bytes; the
    elementwise error bound ``<= scale/2 = max|row|/254`` holds for every
    consumer (VMEM head, all-to-all payload). ``pad >= 4``; the VMEM head
    uses ``pad = 128`` (int8 tiling), comm payloads the minimal 4.
    """
    if pad < 4:
        raise ValueError("pad must hold the 4-byte f32 scale")
    # Refuse differentiation HERE, on the float input: once the rows are
    # int8 no tangent exists anywhere downstream, so a grad through
    # quantization would otherwise come back silently zero.
    rows = serving_only_guard(rows)
    f = rows.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=1, keepdims=True)  # [m, 1]
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8)
    scale_bytes = jax.lax.bitcast_convert_type(
        scale.astype(jnp.float32), jnp.int8
    ).reshape(-1, 4)
    parts = [q, scale_bytes]
    if pad > 4:
        parts.append(jnp.zeros((f.shape[0], pad - 4), jnp.int8))
    return jnp.concatenate(parts, axis=1)


def dequantize_rows(qrows: jax.Array, width: int) -> jax.Array:
    """Inverse of :func:`quantize_rows`: [m, W+pad] int8 -> [m, W] f32."""
    q = qrows[:, :width].astype(jnp.float32)
    scale = jax.lax.bitcast_convert_type(
        qrows[:, width : width + 4], jnp.float32
    ).reshape(-1)
    return q * scale[:, None]


@jax.jit
def quantize_head(head_slice: jax.Array) -> QuantizedHead:
    """Per-row symmetric int8 quantization of ``head_slice [rows, W]``.

    ``W`` must be a multiple of 128 lanes (the tiered engine's int8 path
    is for wide tables; narrow tables line-pack first, which also yields
    a 128-multiple).
    """
    if head_slice.shape[1] % LANES != 0:
        raise ValueError("int8 head needs width % 128 == 0")
    return QuantizedHead(quantize_rows(head_slice, pad=LANES))


def dequant_rows(qh: QuantizedHead) -> jax.Array:
    """Exact dequantized f32 rows (testing / golden-model use)."""
    return dequantize_rows(qh.data, qh.width)


def extract_scales(lines: jax.Array) -> jax.Array:
    """Bitcast the inline f32 scale out of int8 line(s) ``[..., W+128]``."""
    w = lines.shape[-1] - LANES
    sb = lines[..., w : w + 4]
    return jax.lax.bitcast_convert_type(sb, jnp.float32).reshape(
        lines.shape[:-1]
    )


def int8_serving_lookup(
    qtable: QuantizedHead,
    indices: jax.Array,
    weights: Optional[jax.Array] = None,
    *,
    mode: CombineMode = CombineMode.SUM,
) -> jax.Array:
    """Pooled lookup against a FULLY int8-quantized table (serving mode).

    The whole-table counterpart of the int8 hot head: ``quantize_head``
    the entire table once at deployment and serve from it — (W+128)/
    (W*elem) of the exact table's HBM bytes (≈ 0.75x vs bf16, 0.37x vs
    f32 at W=256), same per-element error bound (≤ max|row|/254).
    One gather fetches each row and its inline scale together; the scale
    folds into the combine coefficient. Forward/serving ONLY — like the
    int8 head, differentiation is refused rather than silently dropped
    (:func:`serving_only_guard`).
    """
    from cuembed_tpu.types import combine_coefficients

    b, h = indices.shape
    w = qtable.width
    coeff = combine_coefficients(weights, mode, b, h)
    lines = jnp.take(
        serving_only_guard(qtable.data), indices.reshape(-1), axis=0
    )  # [b*h, W+128] int8 (+ inline scales)
    scales = extract_scales(lines)  # [b*h]
    rows = lines[:, :w].astype(jnp.float32) * (scales * coeff)[:, None]
    return jnp.sum(rows.reshape(b, h, w), axis=1)
