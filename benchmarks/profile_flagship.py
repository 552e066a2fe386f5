#!/usr/bin/env python
"""Capture + parse a profiler trace of the flagship tiered forward.

Writes an xplane trace, then uses tensorboard_plugin_profile's
converters to print the op-level time breakdown (framework_op_stats) —
the ground truth for where the milliseconds go.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.ops.tiered import tiered_forward
from cuembed_tpu.types import CombineMode
from cuembed_tpu.utils.calibration import calibrate_powerlaw_workload


def main():
    V, B, H, W, alpha, dtype = 10_000_000, 65_536, 64, 256, 1.15, jnp.bfloat16
    V = (V // 8) * 8
    elem = jnp.dtype(dtype).itemsize
    cfg, idx_rm, _ = calibrate_powerlaw_workload(
        V, B, H, alpha, W, elem, capacity_margin=1.08
    )
    print(f"cfg: {cfg}", flush=True)

    @jax.jit
    def make_table():
        parts = [
            jax.random.uniform(
                jax.random.key(i), (V // 8, W), jnp.float32, -1, 1
            ).astype(dtype)
            for i in range(8)
        ]
        return jnp.concatenate(parts, axis=0)

    table = jax.block_until_ready(make_table())
    idx = jnp.asarray(idx_rm.reshape(B, H))

    @jax.jit
    def step(table, indices, carry):
        i, dep = carry
        ind = indices + (dep * 0).astype(jnp.int32)
        out = tiered_forward(table, ind, mode=CombineMode.SUM, cfg=cfg)
        return (i + 1, out[0, 0].astype(jnp.float32))

    carry = (jnp.int32(0), jnp.float32(0))
    for _ in range(3):  # warm/compile
        carry = step(table, idx, carry)
    _ = float(carry[1])

    tdir = tempfile.mkdtemp(prefix="flagprof_")
    with jax.profiler.trace(tdir):
        for _ in range(4):
            carry = step(table, idx, carry)
        _ = float(carry[1])
    print(f"trace in {tdir}", flush=True)

    xplanes = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        print("no xplane found"); return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats^", {}
    )
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    # The tool returns JSON; print the top ops by self time.
    try:
        j = json.loads(data)
    except Exception:
        print(data[:4000]); return
    # Format: list of tables; find the per-op table rows
    print(json.dumps(j, indent=1)[:200])
    with open("/tmp/op_stats.json", "w") as f:
        json.dump(j, f)
    print("full stats in /tmp/op_stats.json", flush=True)


if __name__ == "__main__":
    main()
