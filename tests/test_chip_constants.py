"""cuembed_tpu.utils.chip: constants derived from measurement records.

The v5e magic numbers (hot-head VMEM budget, narrow inline-pack bound,
tiering batch-shape law) must be re-derivable from a committed raw
measurement record — the TPU analog of the reference querying its
device (``embedding_lookup.cuh:356-363``) instead of hardcoding.
"""

import json
import os

from cuembed_tpu.utils.chip import (
    V5E_DEFAULTS,
    _reset_cache_for_tests,
    chip_constants,
    derive_chip_constants,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_derive_vmem_budget_from_gather_curve():
    meas = {
        "vmem_gather": [
            {"mb": 4, "mrows_per_s": 350.0},
            {"mb": 16, "mrows_per_s": 340.0},
            {"mb": 48, "mrows_per_s": 330.0},
            {"mb": 96, "mrows_per_s": 310.0},
            {"mb": 112, "mrows_per_s": 300.0},
            {"mb": 144, "mrows_per_s": 80.0},  # fell off VMEM placement
        ]
    }
    c = derive_chip_constants(meas)
    assert c["hot_bytes"] == 112 * 1024 * 1024
    assert c["vmem_table_bytes"] == 112 * 1024 * 1024


def test_derive_narrow_pack_bound():
    c = derive_chip_constants({"pack_relayout_gbps": 320.0})
    # 100 us at 320 GB/s = 32 MB
    assert c["narrow_inline_pack_bytes"] == int(320e9 * 100e-6)


def test_derive_narrow_pack_bound_clamped():
    # An impossible "rate" (probe optimized away) must not widen the
    # inline-pack window past 64 MiB; a tiny rate floors at 1 MiB.
    hi = derive_chip_constants({"pack_relayout_gbps": 2976.0})
    assert hi["narrow_inline_pack_bytes"] == 64 << 20
    lo = derive_chip_constants({"pack_relayout_gbps": 0.001})
    assert lo["narrow_inline_pack_bytes"] == 1 << 20


def test_derive_tiering_law():
    ab = []
    for h in (1, 2, 4, 8):
        for p in (8192, 16384, 32768, 65536):
            win = h >= 4 and p >= 32768
            ab.append({
                "positions": p, "hotness": h,
                "tiered_ms": 1.0 if win else 3.0,
                "xla_ms": 2.0,
            })
    c = derive_chip_constants({"tiering_ab": ab})
    assert c["tiering_min_hotness"] == 4
    assert c["tiering_min_positions"] == 32768


def test_derive_tiering_law_never_profitable():
    ab = [{"positions": p, "hotness": h, "tiered_ms": 3.0, "xla_ms": 2.0}
          for h in (1, 4) for p in (8192, 65536)]
    c = derive_chip_constants({"tiering_ab": ab})
    # falls back to the v5e law rather than inventing a region
    assert c["tiering_min_hotness"] == V5E_DEFAULTS["tiering_min_hotness"]
    assert (c["tiering_min_positions"]
            == V5E_DEFAULTS["tiering_min_positions"])


def test_missing_sections_keep_fallbacks():
    c = derive_chip_constants({})
    for k in ("hot_bytes", "vmem_table_bytes", "narrow_inline_pack_bytes",
              "tiering_min_hotness", "tiering_min_positions"):
        assert c[k] == V5E_DEFAULTS[k]


def test_env_override_roundtrip(tmp_path, monkeypatch):
    rec = {
        "device_kind": "synthetic-test-chip",
        "vmem_gather": [
            {"mb": 4, "mrows_per_s": 100.0},
            {"mb": 64, "mrows_per_s": 95.0},
            {"mb": 128, "mrows_per_s": 20.0},
        ],
        "pack_relayout_gbps": 100.0,
    }
    path = tmp_path / "chip.json"
    path.write_text(json.dumps(rec))
    monkeypatch.setenv("CUEMBED_CHIP_CONSTANTS", str(path))
    _reset_cache_for_tests()
    try:
        c = chip_constants(refresh=True)
        assert c["device_kind"] == "synthetic-test-chip"
        assert c["hot_bytes"] == 64 * 1024 * 1024
        assert c["narrow_inline_pack_bytes"] == int(100e9 * 100e-6)
    finally:
        monkeypatch.delenv("CUEMBED_CHIP_CONSTANTS")
        _reset_cache_for_tests()


def test_committed_record_when_present():
    """If an on-chip record is committed it must parse and derive sane
    values (the runbook regenerates it each chip generation)."""
    data_dir = os.path.join(REPO, "cuembed_tpu", "data")
    if not os.path.isdir(data_dir):
        return
    for name in os.listdir(data_dir):
        if not name.startswith("chip_constants_"):
            continue
        with open(os.path.join(data_dir, name)) as f:
            rec = json.load(f)
        c = derive_chip_constants(rec)
        assert 16 * 2**20 <= c["hot_bytes"] <= 2**31
        assert 2**20 <= c["narrow_inline_pack_bytes"] <= 2**30
        assert 1 <= c["tiering_min_hotness"] <= 64
        assert 1024 <= c["tiering_min_positions"] <= 2**22


def test_constants_feed_dispatch():
    """tiering_profitable reads the active record."""
    from cuembed_tpu.ops.tiered import tiering_profitable

    _reset_cache_for_tests()
    c = chip_constants(refresh=True)
    h, p = c["tiering_min_hotness"], c["tiering_min_positions"]
    assert tiering_profitable(p, h)
    assert not tiering_profitable(p - 1, h)
    assert not tiering_profitable(p, h - 1)
