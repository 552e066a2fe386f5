"""Benchmark timing + application-bandwidth accounting.

The analog of the reference's ``cudaEvent`` timing and bandwidth formulas
(``benchmarks/manual_benchmark.cu:199-287, 340-354, 444-473``).

Timing method: some TPU attachment runtimes (the axon tunnel used in dev)
memoize (executable, input) pairs and complete asynchronously past
``block_until_ready``. ``chain_time`` therefore times a *chained dependency
loop whose state never repeats* and forces a scalar host readback, taking
the slope between a short and a long chain — robust on both normal PJRT
and memoizing tunnels, and the TPU analog of the reference's
cache-cleared per-iteration events.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.types import CombineMode

# Peak HBM bandwidth per chip (GB/s) for roofline reporting.
HBM_PEAK_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5 lite": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "v6 lite": 1640.0,
}


def detect_hbm_peak_gbps(default: float = 819.0) -> float:
    """Best-effort peak-HBM lookup from the attached device kind."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for key, bw in HBM_PEAK_GBPS.items():
        if key in kind:
            return bw
    return default


def chain_time(
    step: Callable,
    x0,
    *,
    k_lo: int = 2,
    k_hi: int = 10,
    repeats: int = 3,
    return_stats: bool = False,
) -> Union[float, dict]:
    """Per-call seconds of ``step`` (a device fn x -> x), best-of-repeats.

    State threads through every call and never resets, so no
    (executable, input) pair repeats; a scalar readback fences each run.
    With ``return_stats`` returns ``{"min": s, "median": s, "max": s}`` —
    the min-of-repeats slope is the headline (matches the reference's
    best-iteration convention), the median guards against the
    min-of-mins flattering a noisy link, and max/min is the noise
    indicator the sweep's outlier policy keys on.
    """
    state = [x0]

    def run(k: int) -> float:
        t0 = time.perf_counter()
        for _ in range(k):
            state[0] = step(state[0])
        leaf = jax.tree_util.tree_leaves(state[0])[0]
        _ = float(jnp.sum(leaf) if getattr(leaf, "ndim", 0) else leaf)
        return time.perf_counter() - t0

    run(2)  # compile + warm
    lo = [run(k_lo) for _ in range(repeats)]
    hi = [run(k_hi) for _ in range(repeats)]

    def slope(red) -> float:
        return max((red(hi) - red(lo)) / (k_hi - k_lo), 1e-9)

    if return_stats:
        return {
            "min": slope(min),
            "median": slope(statistics.median),
            "max": slope(max),
        }
    return slope(min)


# ---------------------------------------------------------------------------
# Application-bandwidth formulas (reference manual_benchmark.cu)
# ---------------------------------------------------------------------------


def forward_app_bytes(
    *,
    batch: int,
    hotness: int,
    width: int,
    elem_bytes: int,
    mode: CombineMode = CombineMode.SUM,
    is_csr: bool = False,
    nnz: Optional[int] = None,
) -> int:
    """Forward application bytes (``manual_benchmark.cu:250-261``).

    fixed: elem * batch * (hotness + (1 if sum else hotness)) * width —
    only kSum pools to one output row in the reference's accounting;
    kMean and kConcat both count hotness output rows.
    CSR:   elem * (nnz - 1 + batch) * width
    """
    if is_csr:
        assert nnz is not None
        return elem_bytes * (nnz - 1 + batch) * width
    reads = batch * hotness * width
    writes = (
        batch * width
        if mode == CombineMode.SUM
        else batch * hotness * width
    )
    return elem_bytes * (reads + writes)


def transpose_app_bytes(
    *,
    nnz: int,
    index_bytes: int,
    batch: int = 0,
    is_csr: bool = False,
    is_weighted: bool = False,
    weight_bytes: int = 4,
    compressed: bool = False,
) -> int:
    """Transpose application bytes (``manual_benchmark.cu:338-354``).

    The reference counts CSR offset reads at nnz * sizeof(OffsetT) (one
    offset word per nonzero), and weights at sizeof(ElemT).
    """
    del batch  # kept for signature stability; the reference counts nnz
    reads = nnz * index_bytes
    if is_csr:
        reads += nnz * index_bytes  # offsets, nnz * sizeof(OffsetT)
    if is_weighted:
        reads += nnz * weight_bytes
    writes = (3 if compressed else 2) * nnz * index_bytes
    if is_weighted:
        writes += nnz * weight_bytes
    return reads + writes


def backward_app_bytes(
    *,
    nnz: int,
    batch: int,
    width: int,
    num_unique: int,
    elem_bytes: int,
    index_bytes: int,
    mode: CombineMode = CombineMode.SUM,
    is_weighted: bool = False,
    l2_variant: bool = False,
) -> int:
    """Backward application bytes, DRAM or L2 variant
    (``manual_benchmark.cu:444-473``).

    Reference semantics: CONCAT reads grad_y at nnz rows and L2 == DRAM;
    otherwise DRAM reads batch rows and L2 = DRAM + nnz rows (the re-read
    of grad_y rows served by the L2).
    """
    writes = width * num_unique * elem_bytes
    reads = 2 * nnz * index_bytes
    if is_weighted:
        reads += nnz * elem_bytes
    if mode == CombineMode.CONCAT:
        reads += width * nnz * elem_bytes
    else:
        reads += width * batch * elem_bytes
        if l2_variant:
            reads += width * nnz * elem_bytes
    return writes + reads


def lookups_per_sec(batch: int, hotness: int, seconds: float) -> float:
    return batch * hotness / seconds


def stream_rate_gbps(mib: int = 512) -> float:
    """Measured streaming-reduce bandwidth (GB/s) over a ``mib`` buffer.

    The quiet-window gate (docs/PERF_NOTES.md #6): the dev tunnel has
    degraded windows where every rate drops 10-20x for minutes. Known-good
    v5e streams ~680 GB/s; callers should treat < ~half of
    ``0.83 * detect_hbm_peak_gbps()`` as "degraded — do not trust or
    commit measurements from this window".
    """
    n = mib * 1024 * 1024 // 4
    big = jnp.arange(n, dtype=jnp.int32)

    def step(c):
        return c + jnp.sum(big + c.astype(jnp.int32)).astype(jnp.float32)

    dt = chain_time(step, jnp.float32(0), k_lo=1, k_hi=4, repeats=2)
    return mib * 1024 * 1024 / dt / 1e9
