#!/usr/bin/env python
"""Benchmark: batched unit-selection synthesis throughput on real hardware.

Scenario = BASELINE.json config #3: ~1M-epoch-unit voice, batched
multi-utterance synthesis.  The pipeline measured is the full flagship step
(normalise -> brute-force fused top-k preselect over the whole DB -> Viterbi
lattice decode with fused join costs -> crossfade OLA), steady-state
(post-compile), on synthetic data sized like a production voice.

Prints ONE JSON line:
    {"metric": "synthesis_rtf", "value": <wallclock_sec / audio_sec>,
     "unit": "wall_sec_per_audio_sec", "vs_baseline": <value / 0.003>}

The reference publishes no speed numbers (BASELINE.md); the baseline used
for vs_baseline is the driver-defined north star RTF <= 0.003 (1 h of 16 kHz
audio in < 10 s on one v5e chip).  vs_baseline < 1.0 beats the target.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, default=1 << 20, help="DB size (rows)")
    ap.add_argument("--dim", type=int, default=151, help="unit feature dim")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t", type=int, default=2048, help="lattice steps per utterance")
    ap.add_argument("--n-candidates", type=int, default=30)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--quick", action="store_true", help="small shapes (smoke test)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="use the XLA preselect instead of the Pallas kernel")
    ap.add_argument("--precision", default="split3",
                    choices=["highest", "split3"],
                    help="distance-matmul precision (split3 = bf16_3x, ~f32 "
                         "accuracy, 25%% faster; unit agreement stays >99%%)")
    ap.add_argument("--sample-rate", type=int, default=16000)
    args = ap.parse_args(argv)

    if args.quick:
        args.units, args.t, args.batch, args.iters, args.chunk = 1 << 14, 256, 2, 2, 4096

    from snickery_tpu import utils
    utils.enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from snickery_tpu.parallel import batched_synth_step, make_mesh, shard_voice
    from __graft_entry__ import _synthetic_voice

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    taper = 50
    span = 160                      # samples per selected unit (~10 ms @ 16 kHz)
    m = utils.next_multiple(args.units, args.chunk)
    t0 = time.time()
    feats, jl, jr, cut1, cut2, waves, mean_t, std_t, sqrt_wt = _synthetic_voice(
        m, args.dim, args.n_candidates)
    print(f"# synthetic voice built: {m} units, {time.time()-t0:.1f}s", file=sys.stderr)

    mesh = make_mesh(1, 1, devices=[dev])
    sv = shard_voice(mesh, feats, jl, jr, cut1, cut2, waves, mean_t, std_t, sqrt_wt)

    rng = np.random.default_rng(7)
    targets = jnp.asarray(
        rng.standard_normal((args.batch, args.t, args.dim)).astype(np.float32))
    lengths = jnp.asarray(np.full(args.batch, args.t, np.int32))
    out_len = args.t * span + 2 * taper
    out_len += (-out_len) % 128

    def step():
        return batched_synth_step(
            sv, targets, lengths, jnp.float32(0.7), jnp.float32(0.0),
            mesh=mesh, n_cand=args.n_candidates, chunk=args.chunk,
            max_frag=512, out_len=out_len, taper=taper,
            use_pallas=not args.no_pallas, mm_precision=args.precision)

    def sync(out):
        # block_until_ready is a no-op on the axon async runtime; a host
        # fetch of a small output is the only reliable completion barrier.
        np.asarray(out[1])          # (B,) total costs
        np.asarray(out[3])          # (B,) total samples
        return out

    t0 = time.time()
    out = sync(step())
    compile_s = time.time() - t0
    print(f"# first step (incl. compile): {compile_s:.1f}s", file=sys.stderr)

    # throughput timing: enqueue all steps, sync once — the device executes
    # the queue serially, so (total / iters) is true per-step throughput
    # without paying the host-fetch round-trip (~100+ ms on the axon relay)
    # per step.  A single-step latency number is also reported.
    t0 = time.time()
    out = sync(step())
    latency = time.time() - t0

    t0 = time.time()
    outs = [step() for _ in range(args.iters)]
    out = outs[-1]
    sync(out)
    wall = (time.time() - t0) / args.iters

    total_samples = np.asarray(out[3])
    audio_sec = float(total_samples.sum()) / args.sample_rate
    rtf = wall / audio_sec
    units_per_sec = args.batch * args.t / wall

    if args.precision != "highest" and not args.quick:
        # fidelity check: unit-sequence agreement of the fast-precision path
        # against exact-f32 selection on the same batch (the >=99% criterion)
        ref = batched_synth_step(
            sv, targets, lengths, jnp.float32(0.7), jnp.float32(0.0),
            mesh=mesh, n_cand=args.n_candidates, chunk=args.chunk,
            max_frag=512, out_len=out_len, taper=taper,
            use_pallas=not args.no_pallas, mm_precision="highest")
        agree = float((np.asarray(out[0]) == np.asarray(ref[0])).mean())
        print(f"# unit-sequence agreement ({args.precision} vs exact f32): "
              f"{agree:.5f}", file=sys.stderr)
    print(
        f"# steady-state: {wall*1e3:.1f} ms/step (throughput), "
        f"{latency*1e3:.1f} ms single-step latency, "
        f"{audio_sec:.1f} audio-sec/step, {units_per_sec:,.0f} lattice-steps/s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "synthesis_rtf",
        "value": rtf,
        "unit": "wall_sec_per_audio_sec",
        "vs_baseline": rtf / 0.003,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
