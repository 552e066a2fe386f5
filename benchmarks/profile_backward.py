#!/usr/bin/env python
"""Profile the flagship compressed backward (tiered and plain) op-by-op."""

from __future__ import annotations

import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.ops.lookup_xla import (
    embedding_backward_compressed_tiered,
    embedding_backward_compressed_xla,
)
from cuembed_tpu.utils.calibration import calibrate_powerlaw_workload


def dump_plane(xplane_path, label):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xplane_path, "rb").read())
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        md = {k: v.name for k, v in p.event_metadata.items()}
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in p.lines:
            if "XLA" not in line.name:
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        print(f"--- {label} ---")
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:18]:
            print(f"{ms:9.3f} ms  x{cnt[name]:<3d} {name[:112]}", flush=True)


def main():
    V, B, H, W, alpha = 10_000_000, 65_536, 64, 256, 1.15
    V = (V // 8) * 8
    cfg, idx_rm, _ = calibrate_powerlaw_workload(
        V, B, H, alpha, W, 2, capacity_margin=1.08
    )
    print(f"cfg: {cfg}", flush=True)
    rng = np.random.default_rng(0)
    n = B * H
    flat = idx_rm.reshape(-1)
    head = cfg.mxu_head_rows
    SENT = np.iinfo(np.int32).max

    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    coeff2d = jnp.ones((B, H), jnp.float32)
    idx2d = jnp.asarray(idx_rm.reshape(B, H))

    def coo(mask_head):
        f = np.where(flat < head, SENT, flat) if mask_head else flat
        order = np.argsort(f, kind="stable")
        return (
            jnp.asarray(f[order].astype(np.int32)),
            jnp.asarray((np.arange(n, dtype=np.int32) // H)[order]),
            jnp.asarray(np.ones((n,), np.float32)),
        )

    t_m = coo(True)
    t_p = coo(False)

    @jax.jit
    def step_tiered(gy, ti, ts, tw, carry):
        g = gy + carry * 0
        out = embedding_backward_compressed_tiered(
            g, V, idx2d, coeff2d, ti, ts, tw, cfg
        )
        return out.rows[0, 0] + out.num_unique.astype(jnp.float32)

    @jax.jit
    def step_plain(gy, ti, ts, tw, carry):
        g = gy + carry * 0
        out = embedding_backward_compressed_xla(g, ti, ts, tw)
        return out.rows[0, 0] + out.num_unique.astype(jnp.float32)

    for label, step, coo_args in (
        ("tiered", step_tiered, t_m),
        ("plain", step_plain, t_p),
    ):
        c = jnp.float32(0)
        for _ in range(2):
            c = step(gy, *coo_args, c)
        _ = float(c)
        tdir = tempfile.mkdtemp(prefix=f"bwdprof_{label}_")
        with jax.profiler.trace(tdir):
            for _ in range(2):
                c = step(gy, *coo_args, c)
            _ = float(c)
        xp = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
        dump_plane(xp[0], label)


if __name__ == "__main__":
    main()
