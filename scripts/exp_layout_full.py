#!/usr/bin/env python
"""Round-5: column-major raw block vs the FULL production step (VERDICT r4
item 1).

scripts/exp_layout.py proved the col-major (major_to_minor=(0,1)) input
format removes the lane-padded T(8,128) copy of the raw block in the
PRESELECT KERNEL (the 8 GiB HLO temp that OOMed the 8.4M-unit capacity
run).  But the production `batched_synth_step` ALSO row-gathers the raw
block (exact-f32 rescore of the k winners + join-context derivation) — a
gather on a col-major operand could make XLA insert its own relayout copy,
recreating the temp.  This script measures the WHOLE compiled step under
both layouts on the real bench voice:

  - unit ids + costs must be bit-identical,
  - ms/step for each,
  - device peak memory (memory_stats largest_alloc / bytes_in_use) so the
    copy temp is visible directly.

The col-major array is passed through a jit wrapper whose in_shardings
carries the Format — otherwise jit would silently relayout the argument
back to default on every call.

Usage: python scripts/exp_layout_full.py [--iters 5] [--batch 8] [--t 512]
"""
import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def mem_gb(dev, key="bytes_in_use"):
    try:
        return dev.memory_stats().get(key, 0) / 2**30
    except Exception:
        return float("nan")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--voice", default="bench1m")
    args = ap.parse_args(argv)

    from snickery_tpu import utils
    utils.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax._src.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    import bench as benchmod
    from snickery_tpu.parallel import batched_synth_step
    from snickery_tpu.synth import Synthesiser
    from snickery_tpu.voicedb.db import VoiceDB

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    utils.warm_transfer()
    cfg = benchmod.bench_config(voice_name=args.voice,
                                length_buckets=[args.t])
    db = VoiceDB.load(os.path.join(benchmod.cache_dir(),
                                   f"{args.voice}.voicedb"))
    synth = Synthesiser(cfg, db=db)
    synth.ensure_sharded()
    voice = synth._sharded_voice

    tgt_feats, _, _ = benchmod.held_out_features(args.batch, 128)
    t_cap = args.t + 2
    prepped = [synth.targets_from_features(f[:t_cap]) for f in tgt_feats]
    t_bucket = utils.bucket_length(max(n for _, n in prepped), (args.t,))
    tgts = np.zeros((args.batch, t_bucket, db.target_dim), np.float32)
    lengths = np.zeros(args.batch, np.int32)
    for b, (tu, n) in enumerate(prepped):
        tgts[b, :n] = tu
        lengths[b] = n
    out_len = utils.next_multiple(
        t_bucket * synth.max_span + 2 * cfg.taper_length, 128)
    tgts_dev, lengths_dev = jnp.asarray(tgts), jnp.asarray(lengths)

    base_gb = mem_gb(dev)
    print(f"# resident before step: {base_gb:.2f} GiB", file=sys.stderr)

    def run(voice_in):
        return batched_synth_step(
            voice_in, tgts_dev, lengths_dev,
            jnp.float32(benchmod.JCW), jnp.float32(0.0),
            mesh=synth._mesh,
            n_cand=min(cfg.n_candidates, synth.n_units_padded),
            chunk=synth.chunk, max_frag=synth.max_frag,
            out_len=out_len, taper=cfg.taper_length,
            use_pallas=synth._use_pallas(),
            mm_precision=cfg.preselect_precision)

    results = {}
    for name in ("rowmajor", "colmajor"):
        if name == "rowmajor":
            v = voice
        else:
            fmt = Format(Layout(major_to_minor=(0, 1)),
                         SingleDeviceSharding(dev))
            raw_cm = jax.device_put(np.asarray(voice.raw), fmt)
            v = voice._replace(raw=raw_cm)
        t0 = time.time()
        out = benchmod.sync(run(v))
        compile_s = time.time() - t0
        peak0 = mem_gb(dev, "peak_bytes_in_use")
        t0 = time.time()
        outs = [run(v) for _ in range(args.iters)]
        benchmod.sync(outs[-1])
        wall = (time.time() - t0) / args.iters
        ids = np.asarray(out[0])
        costs = np.asarray(out[1])
        results[name] = (ids, costs)
        print(f"{name:9s}: {wall*1e3:8.1f} ms/step "
              f"(compile {compile_s:.0f}s)  "
              f"bytes_in_use {mem_gb(dev):.2f} GiB  "
              f"peak {peak0:.2f} GiB", flush=True)

    a, b = results["rowmajor"], results["colmajor"]
    bit = (np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1]))
    print(f"ids+costs bit-identical: {bit}", flush=True)
    return 0 if bit else 1


if __name__ == "__main__":
    raise SystemExit(main())
