#!/usr/bin/env python
"""Preselect-kernel parameter sweep on real TPU hardware.

Times pallas_topk_preselect at headline shape (16384 target rows x 1M-unit
DB x 151 dims, k=30, split3) across (t_tile, chunk, block) combinations to
find the fastest tiling.  The selection overhead is per-grid-step, so the
sweep is mostly about amortising fixed costs without blowing VMEM.

Usage: python scripts/bench_topk.py [--rows 16384] [--units 1048576]
       [--combos "256,2048,16 512,2048,16 256,4096,16 ..."] [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_COMBOS = [
    (256, 2048, 16),     # round-1 default
    (512, 2048, 16),
    (256, 4096, 16),
    (512, 4096, 16),
    (256, 2048, 32),
    (256, 4096, 32),
    (1024, 2048, 16),
    (256, 8192, 32),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--units", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=151)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--precision", default="split3")
    ap.add_argument("--combos", default="")
    args = ap.parse_args(argv)

    from snickery_tpu import utils
    utils.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from snickery_tpu.ops.pallas_topk import pallas_topk_preselect

    combos = DEFAULT_COMBOS
    if args.combos:
        combos = [tuple(int(x) for x in c.split(","))
                  for c in args.combos.split()]

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    targets = jnp.asarray(
        rng.standard_normal((args.rows, args.dim)).astype(np.float32))
    db = jnp.asarray(
        rng.standard_normal((args.units, args.dim)).astype(np.float32))

    results = []
    for (t_tile, chunk, block) in combos:
        if args.rows % t_tile or args.units % chunk or chunk % block:
            print(f"t_tile={t_tile} chunk={chunk} block={block}: skipped (divisibility)")
            continue
        try:
            def run():
                return pallas_topk_preselect(
                    targets, db, k=args.k, mm_precision=args.precision,
                    sort=False, t_tile=t_tile, chunk=chunk, block=block)
            t0 = time.time()
            out = run()
            np.asarray(out[0][:1])      # sync (host fetch)
            compile_s = time.time() - t0
            t0 = time.time()
            outs = [run() for _ in range(args.iters)]
            np.asarray(outs[-1][0][:1])
            wall = (time.time() - t0) / args.iters
            results.append((wall, t_tile, chunk, block))
            print(f"t_tile={t_tile:5d} chunk={chunk:5d} block={block:3d}: "
                  f"{wall*1e3:8.1f} ms  (compile {compile_s:.0f}s)")
        except Exception as e:
            print(f"t_tile={t_tile} chunk={chunk} block={block}: "
                  f"FAILED {type(e).__name__}: {e}")
    if results:
        results.sort()
        w, t, c, b = results[0]
        print(f"\nBEST: t_tile={t} chunk={c} block={b} -> {w*1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
