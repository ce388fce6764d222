#!/usr/bin/env python
"""Round-4 fidelity/perf sweep at the 1M-unit bench voice (real TPU).

Measures, through the PRODUCTION batched step (parallel.batched_synth_step):
  - split3cat at margins {10, 18, 34, 66} x zero-transient {off, on}
  - split3 (margin 10) and highest, as references
reporting steady-state ms/step and broad-gate agreement vs exact-f32
(raw / tie-adjusted / worst per-utterance f64 path-cost gap over ALL
decoded rows — the gate VERDICT r3 weak #2 demands >=0.99 tie-adjusted
and <=1e-6 cost gap at the headline mode).

Decides VERDICT r4 items 2 (split3cat broad-gate miss) and 3 (wire
zero-transient split3cat end-to-end).  Results land in ROADMAP.md.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import bench  # noqa: E402
from bench import (JCW, SR, agreement_metrics, bench_config, cache_dir,  # noqa: E402
                   get_voice, held_out_features, log, make_corpus, sync)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--margins", default="10,18,34,66")
    ap.add_argument("--units", type=int, default=1_048_576)
    args = ap.parse_args()

    from snickery_tpu import utils
    utils.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from snickery_tpu.parallel import batched_synth_step
    from snickery_tpu.synth import Synthesiser
    from snickery_tpu.voicedb.build import build_voicedb

    log(f"device: {jax.devices()[0]}")
    utils.warm_transfer()

    cfg = bench_config(voice_name="bench1m")
    n_utts = args.units // 767
    db = get_voice("bench1m",
                   lambda: build_voicedb(cfg, make_corpus(n_utts, 40, 10_000, False)),
                   cfg, False)
    t0 = time.time()
    synth = Synthesiser(cfg, db=db)
    log(f"device DB prepared in {time.time()-t0:.0f}s")

    synth.ensure_sharded()
    tgt_feats, _, _ = held_out_features(args.batch, 128)
    t_cap = synth.cfg.length_buckets[0] + 2
    tgt_feats = [f[:t_cap] for f in tgt_feats]
    prepped = [synth.targets_from_features(f) for f in tgt_feats]
    B = len(prepped)
    t_bucket = utils.bucket_length(max(n for _, n in prepped),
                                   tuple(synth.cfg.length_buckets))
    tgts = np.zeros((B, t_bucket, db.target_dim), np.float32)
    lengths = np.zeros(B, np.int32)
    for b, (tu, n) in enumerate(prepped):
        tgts[b, :n] = tu
        lengths[b] = n
    out_len = utils.next_multiple(
        t_bucket * synth.max_span + 2 * cfg.taper_length, 128)
    tgts_dev = jnp.asarray(tgts)
    lengths_dev = jnp.asarray(lengths)

    def step(mm_precision, margin=-1, zt=-1):
        return batched_synth_step(
            synth._sharded_voice, tgts_dev, lengths_dev,
            jnp.float32(JCW), jnp.float32(0.0),
            mesh=synth._mesh, n_cand=min(cfg.n_candidates, synth.n_units_padded),
            chunk=synth.chunk, max_frag=synth.max_frag,
            out_len=out_len, taper=cfg.taper_length,
            use_pallas=synth._use_pallas(),
            mm_precision=mm_precision, margin=margin, zero_transient=zt)

    def timed(name, **kw):
        t0 = time.time()
        out = sync(step(**kw))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            out = step(**kw)
        sync(out)
        wall = (time.time() - t0) / args.iters
        log(f"{name}: {wall*1e3:.1f} ms/step (first call {compile_s:.0f}s)")
        return out, wall

    results = {}
    ref_out, ref_wall = timed("highest", mm_precision="highest")
    ids_ref = np.asarray(ref_out[0])
    results["highest"] = {"ms": ref_wall * 1e3}

    def gate(name, out, wall):
        ids = np.asarray(out[0])
        raw_w = adj_w = n_tot = 0.0
        worst_gap = 0.0
        for b in range(B):
            n = int(lengths[b])
            if n < 2:
                continue
            tw_b = (((tgts[b, :n] - db.mean_target) / db.std_target)
                    * synth._sqrt_wt[None, :]).astype(np.float32)
            r, a, g = agreement_metrics(ids[b, :n], ids_ref[b, :n],
                                        tw_b, db, synth, JCW)
            raw_w += r * n
            adj_w += a * n
            n_tot += n
            if abs(g) > abs(worst_gap):
                worst_gap = g
        res = {"ms": wall * 1e3, "raw": raw_w / n_tot, "adj": adj_w / n_tot,
               "worst_gap": worst_gap}
        log(f"{name}: raw {res['raw']:.5f} adj {res['adj']:.5f} "
            f"gap {worst_gap:+.2e}")
        results[name] = res

    out, wall = timed("split3_m10", mm_precision="split3", margin=10, zt=1)
    gate("split3_m10", out, wall)

    margins = [int(m) for m in args.margins.split(",")]
    for zt in (0, 1):
        for m in margins:
            name = f"split3cat_m{m}_zt{zt}"
            out, wall = timed(name, mm_precision="split3cat", margin=m, zt=zt)
            gate(name, out, wall)

    print(json.dumps(results))
    with open(os.path.join(cache_dir(), "exp_fidelity.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
