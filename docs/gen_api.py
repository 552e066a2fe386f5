#!/usr/bin/env python
"""Generate docs/API.md from the package's public surface.

The reference documents its API with Doxygen over the header comments
(``docs/Doxyfile``); this is the same idea over Python introspection —
mechanically derived, so it cannot drift from the code. Regenerate with

    python docs/gen_api.py > docs/API.md
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


MODULES = [
    ("cuembed_tpu", "Top-level package"),
    ("cuembed_tpu.types", "Core types (CombineMode, dtype policy)"),
    ("cuembed_tpu.ops.api", "Differentiable lookup API (custom_vjp)"),
    ("cuembed_tpu.ops.dispatch", "Backend dispatch heuristics"),
    ("cuembed_tpu.ops.tiered", "Tiered hot/cold lookup engine"),
    ("cuembed_tpu.ops.lookup_xla", "XLA-composed forward/backward"),
    ("cuembed_tpu.ops.transforms", "Index transforms (row ids, transpose, compressed grads)"),
    ("cuembed_tpu.ops.narrow", "Narrow-table line packing"),
    ("cuembed_tpu.ops.quant", "Int8 head / payload quantization (lossy, opt-in)"),
    ("cuembed_tpu.ops.pallas_forward", "Pallas forward kernels (opt-in)"),
    ("cuembed_tpu.ops.pallas_backward", "Pallas run-grouped backward kernel (opt-in)"),
    ("cuembed_tpu.table", "Stateful auto-tiering table wrapper"),
    ("cuembed_tpu.offload", "Host-offloaded tables (device head + host tail)"),
    ("cuembed_tpu.fused", "Fused multi-table groups"),
    ("cuembed_tpu.collection", "Multi-table collection"),
    ("cuembed_tpu.train", "Single-chip sparse training updates"),
    ("cuembed_tpu.models.embedding_bag", "EmbeddingBag module"),
    ("cuembed_tpu.models.dlrm", "DLRM reference model"),
    ("cuembed_tpu.parallel.sharding", "Mesh / sharding helpers"),
    ("cuembed_tpu.parallel.sharded_lookup", "Masked+psum and column-sharded lookups"),
    ("cuembed_tpu.parallel.alltoall_lookup", "All-to-all routed + hybrid lookups"),
    ("cuembed_tpu.parallel.train", "Routed sparse optimizer updates"),
    ("cuembed_tpu.parallel.planner", "Automatic placement planner"),
    ("cuembed_tpu.parallel.multihost", "Multi-host bootstrap"),
    ("cuembed_tpu.utils.allocation", "Workload descriptors + problem allocation"),
    ("cuembed_tpu.utils.datagen", "Power-law index generation"),
    ("cuembed_tpu.utils.frequency", "Frequency statistics / tier calibration"),
    ("cuembed_tpu.utils.calibration", "Tiered-config calibration"),
    ("cuembed_tpu.utils.benchmarking", "Timing + bandwidth formulas"),
    ("cuembed_tpu.utils.chip", "Chip constants (measured dispatch thresholds)"),
    ("cuembed_tpu.utils.pipeline", "Host input pipeline (background remap)"),
    ("cuembed_tpu.native", "C++ host kernels (ctypes, numpy fallback)"),
    ("cuembed_tpu.ref.forward", "Golden model: forward"),
    ("cuembed_tpu.ref.backward", "Golden model: backward"),
    ("cuembed_tpu.ref.transforms", "Golden model: index transforms"),
]


def first_line(doc):
    return (doc or "").strip().splitlines()[0] if doc else ""


def item_sig(obj, name):
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        sig = "(...)"
    if len(sig) > 100:
        sig = sig[:97] + "...)"
    return f"`{name}{sig}`"


def public_items(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in sorted(names):
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        # only items defined (or re-exported deliberately via __all__) here
        home = getattr(obj, "__module__", mod.__name__)
        if getattr(mod, "__all__", None) is None and home != mod.__name__:
            continue
        if inspect.isfunction(obj) or inspect.isclass(obj):
            out.append((n, obj))
    return out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    print("# cuembed_tpu API reference")
    print()
    print("Mechanically generated from docstrings — regenerate with")
    print("`python docs/gen_api.py > docs/API.md`. One-line summaries;")
    print("full contracts live in the docstrings (`help(obj)`).")
    for modname, blurb in MODULES:
        try:
            __import__(modname)
        except Exception as e:  # pragma: no cover
            print(f"<!-- {modname}: import failed: {e} -->", file=sys.stderr)
            continue
        mod = sys.modules[modname]
        print(f"\n## `{modname}` — {blurb}\n")
        head = first_line(mod.__doc__)
        if head:
            print(f"{head}\n")
        items = public_items(mod)
        for n, obj in items:
            if inspect.isclass(obj):
                print(f"- **class** `{n}` — {first_line(obj.__doc__)}")
                for mn, m in sorted(vars(obj).items()):
                    if mn.startswith("_") or not callable(m):
                        continue
                    print(f"  - {item_sig(m, mn)} — {first_line(m.__doc__)}")
            else:
                print(f"- {item_sig(obj, n)} — {first_line(obj.__doc__)}")


if __name__ == "__main__":
    main()
