"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by the benchmark harness; the test suite
targets determinism + parity, which (like the reference's host-compiled
functor tests, ``embedding_lookup_ops.cuh:33-35``) is hardware-independent.
Pallas kernels run in interpreter mode on CPU (see kernel tests).
"""

import os

# Force CPU even when a TPU plugin (axon) is present: JAX_PLATFORMS alone is
# not honored once the plugin registers, JAX_PLATFORM_NAME is.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Note: x64 stays disabled, matching TPU reality. int64 indices are accepted
# at the API boundary and routed through int32 (types.canonical_index_dtype).
