#!/usr/bin/env python
"""Round-4 join-quality experiment (VERDICT r4 item 5).

The quality trend's join_flux_ratio plateaus ~1.4 regardless of DB size
with the default raw OLA (taper 50 = 3.1 ms).  This measures every
smoothing lever the framework already has, side by side, on the cached
bench voices:

  - OLA taper sweep {50, 100, 200, 400} — selection is taper-independent,
    so we decode ONCE per voice and re-OLA on host (host_overlap_add is
    sample-identical to the device kernel by test).
  - magphase resynthesis raw vs magphase_overlap=1 vs smooth_joins (the
    reference's vocoder-output mode; join positions from the integrated
    epoch grid).

Reports MCD (vs the held-out reference wave) + join flux ratio per variant.
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import bench  # noqa: E402
from bench import SR, bench_config, cache_dir, get_voice, held_out_features, log  # noqa: E402


def flux_at(wave, starts):
    from snickery_tpu.evaluate import join_discontinuity
    out = join_discontinuity(wave, SR, starts)
    return float(out["ratio"])


def ola_variant(synth, ids, taper):
    """Host OLA of a decoded unit sequence at an arbitrary taper + the
    non-natural join start positions in that output."""
    from snickery_tpu.ops.ola import host_overlap_add
    cuts = synth.db.cutpoints
    c1 = cuts[ids, 1]
    c2 = cuts[ids, 2]
    wave = host_overlap_add(synth.db.waves, c1, c2, taper)
    spans = (c2 - c1).astype(np.int64)
    starts = taper + np.cumsum(spans) - spans
    nonnat = np.nonzero(cuts[ids[1:], 1] != cuts[ids[:-1], 2])[0] + 1
    return wave, starts[nonnat]


def magphase_variant(synth, ids, smooth, overlap):
    """Vocoder resynthesis of the selected units + join starts from the
    integrated epoch grid."""
    old_smooth = synth.cfg.magphase_smooth_joins
    synth.cfg.magphase_smooth_joins = smooth
    try:
        wave = synth.resynth_magphase(ids)
    finally:
        synth.cfg.magphase_smooth_joins = old_smooth
    k = synth.frames_per_unit
    lf0 = np.asarray(synth.db.unit_lf0[np.asarray(ids)]).reshape(-1)
    periods = SR / np.maximum(np.exp(lf0), 1e-3)
    periods = np.clip(periods, 2, 2 * SR / 50.0)
    epochs = np.cumsum(periods).astype(np.int64)
    cuts = synth.db.cutpoints
    nonnat = np.nonzero(cuts[ids[1:], 1] != cuts[ids[:-1], 2])[0] + 1
    starts = epochs[nonnat * k - 1]            # boundary epoch of each join
    return wave, starts


def eval_voice(name, synth, feats, ref_waves, results):
    from snickery_tpu.evaluate import mel_cepstral_distortion, nsim

    decoded = []
    for f in feats:
        f = f[: 2 * synth.cfg.length_buckets[-1]]
        r = synth.synth_from_features(f)
        decoded.append(np.asarray(r["unit_ids"]))

    rows = {}

    def add(variant, waves_and_starts):
        mcds, fluxes, nsims = [], [], []
        for (w, starts), ref in zip(waves_and_starts, ref_waves):
            mcds.append(mel_cepstral_distortion(w, ref, SR))
            nsims.append(nsim(w, ref, SR))
            fluxes.append(flux_at(w, starts))
        rows[variant] = {"mcd": float(np.nanmean(mcds)),
                         "nsim": float(np.nanmean(nsims)),
                         "flux": float(np.nanmean(fluxes))}
        log(f"{name} {variant}: MCD {rows[variant]['mcd']:.2f} dB, "
            f"NSIM {rows[variant]['nsim']:.3f}, "
            f"flux {rows[variant]['flux']:.3f}")

    for taper in (50, 100, 200, 400):
        add(f"ola_taper{taper}",
            [ola_variant(synth, ids, taper) for ids in decoded])
    try:
        add("magphase_raw",
            [magphase_variant(synth, ids, 0, 0) for ids in decoded])
        k = synth.frames_per_unit
        if k >= 2:
            add("magphase_smooth1",
                [magphase_variant(synth, ids, 1, 0) for ids in decoded])
    except Exception as e:  # pragma: no cover
        log(f"{name} magphase variants failed: {type(e).__name__}: {e}")
    results[name] = rows


def main():
    from snickery_tpu import utils
    utils.enable_compilation_cache()
    import jax
    from snickery_tpu.synth import Synthesiser
    from snickery_tpu.voicedb.build import build_voicedb

    log(f"device: {jax.devices()[0]}")
    utils.warm_transfer()
    feats, ref_waves, _ = held_out_features(3, 32, seed0=95_000)
    results = {}

    cfg_mid = bench_config(voice_name="benchmid", length_buckets=[512])
    db_mid = get_voice(
        "benchmid",
        lambda: build_voicedb(cfg_mid, bench.make_corpus(220, 40, 75_000, False)),
        cfg_mid, False)
    eval_voice("benchmid", Synthesiser(cfg_mid, db=db_mid), feats, ref_waves,
               results)

    cfg_1m = bench_config(voice_name="bench1m", length_buckets=[512])
    db_1m = get_voice(
        "bench1m",
        lambda: build_voicedb(cfg_1m, bench.make_corpus(1_048_576 // 767, 40,
                                                        10_000, False)),
        cfg_1m, False)
    eval_voice("bench1m", Synthesiser(cfg_1m, db=db_1m), feats, ref_waves,
               results)

    # multiepoch=2 voice: frames_per_unit=2, so trajectory smoothing applies
    me2_dir = os.path.join(cache_dir(), "bench1m_me2.voicedb")
    if os.path.isdir(me2_dir):
        cfg_me2 = bench_config(voice_name="bench1m_me2", multiepoch=2,
                               length_buckets=[512])
        from snickery_tpu.voicedb.db import VoiceDB
        db_me2 = VoiceDB.load(me2_dir)
        eval_voice("bench1m_me2", Synthesiser(cfg_me2, db=db_me2), feats,
                   ref_waves, results)

    print(json.dumps(results))
    with open(os.path.join(cache_dir(), "exp_joins.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
