"""Multi-host initialization and mesh construction.

Everything in :mod:`cuembed_tpu.parallel` is mesh-generic: on a multi-host
pod slice the same ``shard_map`` programs run with collectives riding ICI
within a slice and DCN across slices — JAX inserts the right transport
per mesh axis. This module is the thin bootstrap:

    from cuembed_tpu.parallel import multihost
    multihost.initialize()           # jax.distributed, TPU autodetects
    mesh = multihost.pod_mesh()      # (data, model) over all global devices

Design note (ICI vs DCN): keep the ``model`` axis (all-to-all index
routing + row responses) within a slice — `pod_mesh` orders devices so
the model axis maps to the fastest (innermost) hardware dimension — and
let the ``data`` axis cross slices; data-parallel gradient reductions
tolerate DCN latency, per-lookup all-to-alls do not.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from cuembed_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def initialize(**kwargs) -> None:
    """Initialize jax.distributed (no-op if already initialized or
    running single-process with nothing to autodetect)."""
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except ValueError:
        # A bare initialize() in a single-process context has no
        # coordinator to autodetect — that is fine. With explicit
        # arguments a failure is a real configuration error: surface it.
        if kwargs:
            raise


def pod_mesh(n_model: Optional[int] = None) -> jax.sharding.Mesh:
    """A ``(data, model)`` mesh over all global devices.

    ``n_model`` defaults to the local device count, so the model axis
    (per-lookup all-to-alls) stays within one host's ICI domain and the
    data axis spans hosts.
    """
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = devices.size
    if n_model is None:
        n_model = min(jax.local_device_count(), n)
    while n % n_model != 0:
        n_model //= 2
    return Mesh(devices.reshape(n // n_model, n_model), (DATA_AXIS, MODEL_AXIS))
