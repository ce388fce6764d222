#!/usr/bin/env python
"""Experiment: raw-block HBM layout vs the preselect kernel (round 4).

The XLA memory dump from the 8.4M-unit capacity OOM showed the compiled
step COPIES the entire resident raw block into a lane-padded T(8,128)
layout every execution (f32[M,152]: 152 lanes pad to 256 -> a 1.7x-sized
HLO temp; 8 GiB at 8.4M units).  A minimal repro confirmed the argument
itself is stored compact (608 B/row) and that a column-major
(major_to_minor=(0,1)) input format removes the copy entirely.

This script measures the PRODUCTION kernel (zero-transient split3cat /
split3 on the real bench1m block) under both layouts:
  - ids/scores must be bit-identical,
  - report ms/call and on-device bytes for each.

Usage: python scripts/exp_layout.py [--rows 16384] [--iters 5]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--k", type=int, default=48)
    ap.add_argument("--precisions", default="split3cat,split3")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax._src.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    import bench as benchmod
    from snickery_tpu.ops.pallas_topk import pallas_topk_preselect
    from snickery_tpu.voicedb.db import VoiceDB
    from snickery_tpu.voicedb.device_layout import build_raw_blocks

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    db_v = VoiceDB.load(os.path.join(benchmod.cache_dir(), "bench1m.voicedb"))
    mp = ((db_v.n_units + 8191) // 8192) * 8192
    raw_block, _, _ = build_raw_blocks(
        db_v.unit_features, db_v.join_right, mp, ndb=1)
    kd = db_v.unit_features.shape[1]
    db_affine = (jnp.asarray(db_v.mean_target.astype(np.float32)),
                 jnp.asarray(db_v.std_target.astype(np.float32)),
                 jnp.ones((kd,), jnp.float32),
                 jnp.int32(db_v.n_units))

    tf, _, _ = benchmod.held_out_features(8, 128)
    rows = [(f[1:-1] - db_v.mean_target) / db_v.std_target for f in tf]
    tw = np.concatenate(rows)[: args.rows].astype(np.float32)
    tw = np.pad(tw, ((0, (-len(tw)) % 1024), (0, 0)))
    targets = jnp.asarray(tw)

    dev = jax.devices()[0]
    layouts = {
        "rowmajor": jax.device_put(raw_block, dev),
        "colmajor": jax.device_put(
            raw_block, Format(Layout(major_to_minor=(0, 1)),
                              SingleDeviceSharding(dev))),
    }
    for name, db in layouts.items():
        print(f"# {name}: on-device "
              f"{db.on_device_size_in_bytes()/2**30:.2f} GiB", file=sys.stderr)

    for prec in args.precisions.split(","):
        ref = None
        for name, db in layouts.items():
            def run():
                return pallas_topk_preselect(
                    targets, db, k=args.k, mm_precision=prec, sort=False,
                    db_affine=db_affine, zero_transient=True, m_rows=mp)
            t0 = time.time()
            out = run()
            ids = np.asarray(out[0])
            scores = np.asarray(out[1])
            compile_s = time.time() - t0
            t0 = time.time()
            outs = [run() for _ in range(args.iters)]
            np.asarray(outs[-1][0][:1])
            wall = (time.time() - t0) / args.iters
            if ref is None:
                ref = (ids, scores)
                match = "ref"
            else:
                bit = (np.array_equal(ids, ref[0])
                       and np.array_equal(scores, ref[1]))
                match = "bit-identical" if bit else "MISMATCH"
            print(f"{prec:10s} {name}: {wall*1e3:8.1f} ms "
                  f"(compile {compile_s:.0f}s)  {match}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
