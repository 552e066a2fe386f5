"""Chip constants: measured numbers that gate the engine's decisions.

Three "magic numbers" steer dispatch and tiering (all measured on v5e,
``docs/PERF_NOTES.md``):

* ``hot_bytes`` / ``vmem_table_bytes`` — the largest operand XLA still
  serves at the VMEM gather rate (~300 M rows/s); sets the hot-head
  budget and the "whole table is VMEM-served" threshold.
* ``narrow_inline_pack_bytes`` — the largest raw narrow table
  auto-dispatch may line-pack per call (the relayout must be noise next
  to any lookup).
* ``tiering_min_hotness`` / ``tiering_min_positions`` — the measured
  batch-shape law: where the tiered engine beats the plain gather.

The reference queries its device instead of hardcoding
(``embedding_lookup.cuh:356-363``); the TPU analog is this module:
:func:`derive_chip_constants` re-derives every constant from a raw
measurement record (produced on-chip by ``benchmarks/calibrate_chip.py``
and committed as ``cuembed_tpu/data/chip_constants_<kind>.json``), and
:func:`chip_constants` loads the record matching the attached device at
first use — falling back to the v5e values when no record exists.
Point ``CUEMBED_CHIP_CONSTANTS`` at a JSON file to override.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Optional

# Measured v5e fallbacks (docs/PERF_NOTES.md; round-4 sweep law).
V5E_DEFAULTS = {
    "device_kind": "v5e (builtin fallback)",
    "hot_bytes": 108 * 1024 * 1024,
    "vmem_table_bytes": 108 * 1024 * 1024,
    "narrow_inline_pack_bytes": 8 * 1024 * 1024,
    "tiering_min_hotness": 4,
    "tiering_min_positions": 32768,
}

_lock = threading.Lock()
_cached: Optional[dict] = None


def derive_chip_constants(measurements: dict) -> dict:
    """Derive every dispatch constant from a raw measurement record.

    ``measurements`` (any subset; missing sections keep the v5e
    fallback):

    * ``vmem_gather``: list of ``{"mb": int, "mrows_per_s": float}`` —
      row-gather rate vs source-operand size. The VMEM budget is the
      largest operand still within 75% of the small-operand rate
      (measured: the rate is FLAT inside VMEM placement and drops ~4x
      outside, so any threshold between ~40% and ~90% finds the same
      boundary).
    * ``pack_relayout_gbps``: float — narrow-table line-pack relayout
      throughput. The inline-pack bound allows ~100 us of relayout
      (noise next to any real lookup; the round-2 defect was a ~20 ms
      inline repack).
    * ``tiering_ab``: list of ``{"positions": int, "hotness": int,
      "tiered_ms": float, "xla_ms": float}`` — A/B grid on a >VMEM
      table. The law is the smallest (hotness, positions) corner such
      that every measured point at or past it tiers profitably.
    """
    out = dict(V5E_DEFAULTS)
    out["device_kind"] = measurements.get(
        "device_kind", out["device_kind"]
    )

    g = measurements.get("vmem_gather")
    if g:
        base = max(
            p["mrows_per_s"] for p in g if p["mb"] <= min(
                x["mb"] for x in g
            ) * 4
        )
        inside = [p["mb"] for p in g if p["mrows_per_s"] >= 0.75 * base]
        if inside:
            budget = max(inside) * 1024 * 1024
            out["hot_bytes"] = budget
            out["vmem_table_bytes"] = budget

    rate = measurements.get("pack_relayout_gbps")
    if rate:
        # 100 us of relayout is noise next to any real lookup. Clamp to
        # [1 MiB, 64 MiB]: a relayout "rate" above the streaming
        # bandwidth means the probe was optimized away (a pure
        # permutation commutes with plain reductions) and must not widen
        # the inline-pack window unboundedly.
        out["narrow_inline_pack_bytes"] = max(
            1 << 20, min(int(rate * 1e9 * 100e-6), 64 << 20)
        )

    ab = measurements.get("tiering_ab")
    if ab:
        hots = sorted({p["hotness"] for p in ab})
        poss = sorted({p["positions"] for p in ab})

        def wins(h0, p0):
            pts = [p for p in ab
                   if p["hotness"] >= h0 and p["positions"] >= p0]
            return bool(pts) and all(
                p["tiered_ms"] < p["xla_ms"] for p in pts
            )

        best = None
        for h0 in hots:
            for p0 in poss:
                if wins(h0, p0):
                    if best is None or (h0, p0) < best:
                        best = (h0, p0)
                    break
        if best is not None:
            out["tiering_min_hotness"] = best[0]
            out["tiering_min_positions"] = best[1]
    return out


def _data_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")


def _detect_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind.lower()
    except Exception:
        return ""


def chip_constants(refresh: bool = False) -> dict:
    """The active constants record (cached after first load).

    Resolution order: ``CUEMBED_CHIP_CONSTANTS`` env path ->
    ``cuembed_tpu/data/chip_constants_<kind>.json`` for the attached
    device kind -> built-in v5e fallbacks. Derived fields are
    recomputed from the record's raw measurements at load time, so a
    committed record stays self-describing.
    """
    global _cached
    with _lock:
        if _cached is not None and not refresh:
            return _cached
        path = os.environ.get("CUEMBED_CHIP_CONSTANTS")
        if not path:
            kind = _detect_kind()
            slug = "".join(
                ch if ch.isalnum() else "_" for ch in kind
            ).strip("_")
            for candidate in ([slug] if slug else []) + ["v5e"]:
                p = os.path.join(
                    _data_dir(), f"chip_constants_{candidate}.json"
                )
                if os.path.exists(p):
                    path = p
                    break
        if path and os.path.exists(path):
            with open(path) as f:
                record = json.load(f)
            _cached = derive_chip_constants(record)
        else:
            _cached = dict(V5E_DEFAULTS)
        return _cached


def _reset_cache_for_tests() -> None:
    global _cached
    with _lock:
        _cached = None
