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

def cluster_order(feats: np.ndarray, n_clusters: int = 1024,
                  sample: int = 100_000, iters: int = 8,
                  seed: int = 0) -> np.ndarray:
    """Row permutation grouping acoustically-similar units into contiguous
    runs (minibatch k-means fit on a sample, blocked full assignment).
    Locality concentrates any query's top-k into few DB chunks, which
    collapses the kernel's data-dependent pick loops for most chunks."""
    rng = np.random.default_rng(seed)
    m = len(feats)
    idx = rng.choice(m, size=min(sample, m), replace=False)
    x = feats[idx].astype(np.float32)
    c = x[rng.choice(len(x), size=n_clusters, replace=False)].copy()
    for _ in range(iters):
        d = (c * c).sum(1)[None, :] - 2.0 * x @ c.T          # (s, k)
        a = d.argmin(1)
        sums = np.zeros_like(c)
        np.add.at(sums, a, x)
        counts = np.bincount(a, minlength=n_clusters)[:, None]
        nz = counts[:, 0] > 0
        c[nz] = sums[nz] / counts[nz]
    # blocked full assignment
    assign = np.empty(m, np.int32)
    csq = (c * c).sum(1)[None, :]
    for lo in range(0, m, 65536):
        hi = min(lo + 65536, m)
        d = csq - 2.0 * feats[lo:hi] @ c.T
        assign[lo:hi] = d.argmin(1)
    return np.argsort(assign, kind="stable")


DEFAULT_COMBOS = [
    # current-generation tilings (block=128 era; see pallas_topk.py header)
    (256, 4096, 128),    # default
    (256, 2048, 128),
    (512, 4096, 128),
    (256, 8192, 128),
    (256, 4096, 64),
    (256, 4096, 256),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--units", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=151)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--precision", default="split3cat")
    ap.add_argument("--select", default="auto",
                    help="kernel selection loop (matches the kernel default)")
    ap.add_argument("--combos", default="",
                    help="space list of t,chunk,block[,precision[,select]]")
    ap.add_argument("--real", action="store_true",
                    help="use the cached bench1m voice (real clustered data "
                         "+ coherent held-out targets) instead of gaussians")
    ap.add_argument("--cluster", action="store_true",
                    help="with --real: reorder DB rows by k-means cluster "
                         "(locality lever for the pick loop)")
    ap.add_argument("--scatter", action="store_true",
                    help="with --real: stride-permute DB rows (golden-ratio "
                         "step) so runs of consecutive near-duplicate epochs "
                         "never share a 128-row block — collapses the "
                         "pileup tail that forces packed3's fallback")
    ap.add_argument("--db-op", default="norm",
                    choices=("norm", "raw", "zt"),
                    help="with --real: DB operand form. 'norm' = pre-"
                         "normalised features (kernel-only timing), 'raw' = "
                         "raw rows + in-jit affine (the production derived-"
                         "operand path incl. its per-step transform), 'zt' = "
                         "zero-transient capacity mode (raw resident block, "
                         "affine folded into prescaled targets)")
    args = ap.parse_args(argv)

    from snickery_tpu import utils
    utils.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from snickery_tpu.ops.pallas_topk import pallas_topk_preselect

    combos = DEFAULT_COMBOS
    if args.combos:
        combos = [tuple(int(x) if x.lstrip("-").isdigit() else x
                        for x in c.split(","))
                  for c in args.combos.split()]

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    db_affine = None
    zt = False
    m_rows = None
    if args.real:
        import bench as benchmod
        from snickery_tpu.voicedb.db import VoiceDB
        db_v = VoiceDB.load(os.path.join(benchmod.cache_dir(), "bench1m.voicedb"))
        mp = ((db_v.n_units + 8191) // 8192) * 8192
        if args.db_op in ("raw", "zt"):
            # production operand forms: the kernel wrapper derives the
            # normalised operand in-jit ('raw') or folds the affine into
            # prescaled targets and reads the resident raw block ('zt')
            from snickery_tpu.voicedb.device_layout import build_raw_blocks
            import jax.numpy as _jnp
            raw_block, _, _ = build_raw_blocks(
                db_v.unit_features, db_v.join_right, mp, ndb=1)
            kd = db_v.unit_features.shape[1]
            db_affine = (_jnp.asarray(db_v.mean_target.astype(np.float32)),
                         _jnp.asarray(db_v.std_target.astype(np.float32)),
                         _jnp.ones((kd,), _jnp.float32),
                         _jnp.int32(db_v.n_units))
            zt = args.db_op == "zt"
            feats = raw_block if zt else raw_block[:mp, :kd]
            m_rows = mp if zt else None
        else:
            feats = db_v.normalised_features().astype(np.float32)
            feats = np.pad(feats, ((0, mp - feats.shape[0]), (0, 0)),
                           constant_values=1e6)
        if args.cluster:
            t0 = time.time()
            order = cluster_order(feats[:db_v.n_units])
            feats[:db_v.n_units] = feats[:db_v.n_units][order]
            print(f"# clustered DB order in {time.time()-t0:.0f}s", file=sys.stderr)
        if args.scatter:
            n = db_v.n_units
            step = 1
            for c in range(int(0.618 * n) | 1, n):
                if np.gcd(c, n) == 1:
                    step = c
                    break
            order = (np.arange(n, dtype=np.int64) * step) % n
            feats[:n] = feats[:n][order]
            print(f"# scattered DB order (stride {step})", file=sys.stderr)
        tf, _, _ = benchmod.held_out_features(8, 128)
        rows = []
        for f in tf:
            usable = f[1:-1]
            rows.append(((usable - db_v.mean_target) / db_v.std_target))
        tw = np.concatenate(rows)[: args.rows].astype(np.float32)
        pad = (-len(tw)) % 1024
        tw = np.pad(tw, ((0, pad), (0, 0)))
        targets = jnp.asarray(tw)
        db = jnp.asarray(feats)
        args.rows = targets.shape[0]
        args.units = mp          # grid rows (zt blocks carry a halo tail)
        args.dim = db.shape[1]
        print(f"# real data: {args.units} units, {args.rows} target rows, "
              f"db-op {args.db_op}", file=sys.stderr)
    else:
        rng = np.random.default_rng(0)
        targets = jnp.asarray(
            rng.standard_normal((args.rows, args.dim)).astype(np.float32))
        db = jnp.asarray(
            rng.standard_normal((args.units, args.dim)).astype(np.float32))

    results = []
    for combo in combos:
        t_tile, chunk, block = combo[:3]
        prec = combo[3] if len(combo) > 3 else args.precision
        sel = combo[4] if len(combo) > 4 else args.select
        tag = (f"t_tile={t_tile:5} chunk={chunk:5} block={block:3} "
               f"{prec:9s} {sel:6s}")
        if args.rows % t_tile or args.units % chunk or chunk % block:
            print(f"{tag}: skipped (divisibility)")
            continue
        try:
            def run():
                return pallas_topk_preselect(
                    targets, db, k=args.k, mm_precision=prec,
                    sort=False, t_tile=t_tile, chunk=chunk, block=block,
                    select=sel, db_affine=db_affine,
                    zero_transient=zt, m_rows=m_rows)
            t0 = time.time()
            out = run()
            np.asarray(out[0][:1])      # sync (host fetch)
            compile_s = time.time() - t0
            t0 = time.time()
            outs = [run() for _ in range(args.iters)]
            np.asarray(outs[-1][0][:1])
            wall = (time.time() - t0) / args.iters
            results.append((wall, tag))
            note = ""
            if sel == "packed3diag":
                n_ovf = int(np.sum(np.asarray(out[2]) > 0))
                note = f"  overflow {n_ovf}/{out[2].shape[0]} cols"
            print(f"{tag}: {wall*1e3:8.1f} ms  (compile {compile_s:.0f}s)"
                  f"{note}", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
    if results:
        results.sort()
        print(f"\nBEST: {results[0][1]} -> {results[0][0]*1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
