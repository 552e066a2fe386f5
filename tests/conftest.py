"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by the benchmark harness and the verify
drive; the test suite targets determinism + parity, which (like the
reference's host-compiled functor tests, ``embedding_lookup_ops.cuh:33-35``)
is hardware-independent. Pallas kernels run in interpreter mode on CPU.

Note: this box preimports jax from a sitecustomize hook, so env vars set
here are too late — ``jax.config.update`` still works because no backend
has initialized yet. XLA_FLAGS is also still unread at this point.
"""

import os

# On-chip lane: JAX_PLATFORMS=tpu pytest -m tpu runs the real-TPU subset
# (tests/test_tpu_lane.py) against the attached chip — Mosaic/XLA
# lowering regressions are caught here, not only in the benchmark.
_TPU_LANE = os.environ.get("JAX_PLATFORMS", "").lower() == "tpu"

if not _TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

# int64 indices are accepted at the API boundary and routed through int32
# (types.canonical_index_dtype); x64 stays off, matching TPU reality.
