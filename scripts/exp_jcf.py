#!/usr/bin/env python
"""Round-4 wider-join-context measurement at 1M-unit scale (VERDICT r4 item 5).

Compares join_context_frames = 1 vs 2 on the SAME unit inventory — the
cached bench1m_me2 voice (multiepoch=2, ~524k units).  The jcf=2 join
arrays are derived exactly from the voice's own data instead of a 17-minute
corpus rebuild:

  - join_left_2  = unit_features[:, :2d]            (exact: the me2 target
                   row stores frames [f(start), f(start+1)])
  - join_right_2 = next unit's unit_features[:, :2d] for corpus-consecutive
                   units (exact: unit i+1 starts at ends[i]+1); utterance-
                   final units (~1 per utterance, 0.26% of units) duplicate
                   their stored 1-frame jr — a boundary approximation that
                   cannot affect the flux statistics materially.

Reports MCD + join-flux for both widths on the same held-out targets
(selection CHANGES with jcf — that is the point: a 2-frame join cost
penalises transitions whose mismatch only shows one frame later).
"""
import copy
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import bench  # noqa: E402
from bench import SR, bench_config, cache_dir, held_out_features, log  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_joins import flux_at, ola_variant  # noqa: E402


def widen_joins(db):
    """Return a copy of an me2 VoiceDB with exact 2-frame join contexts."""
    d = db.join_dim
    feats = np.asarray(db.unit_features)
    assert feats.shape[1] == 2 * d, "needs a multiepoch=2 voice"
    jl2 = feats[:, : 2 * d].copy()
    jr2 = np.empty_like(jl2)
    jr2[:-1] = feats[1:, : 2 * d]
    contiguous = np.zeros(db.n_units, bool)
    contiguous[:-1] = ((db.utt_index[1:] == db.utt_index[:-1])
                       & (db.unit_pos[1:] == db.unit_pos[:-1] + 1))
    jr1 = np.asarray(db.join_right)
    n_exc = int((~contiguous).sum())
    jr2[~contiguous] = np.concatenate([jr1[~contiguous]] * 2, axis=1)
    log(f"widened joins: {n_exc}/{db.n_units} boundary units "
        f"({100.0 * n_exc / db.n_units:.2f}%) use the duplicated-frame "
        "approximation")
    db2 = copy.copy(db)
    db2.join_left = jl2
    db2.join_right = jr2
    join_all = np.concatenate([jl2, jr2])
    db2.mean_join = join_all.mean(axis=0).astype(np.float32)
    db2.std_join = np.maximum(join_all.std(axis=0), 1e-8).astype(np.float32)
    return db2


def main():
    from snickery_tpu import utils
    utils.enable_compilation_cache()
    import jax
    from snickery_tpu.evaluate import mel_cepstral_distortion
    from snickery_tpu.synth import Synthesiser
    from snickery_tpu.voicedb.db import VoiceDB

    log(f"device: {jax.devices()[0]}")
    utils.warm_transfer()
    feats, ref_waves, _ = held_out_features(3, 32, seed0=95_000)

    me2_dir = os.path.join(cache_dir(), "bench1m_me2.voicedb")
    db1 = VoiceDB.load(me2_dir)
    results = {}

    for jcf, db in (("jcf1", db1), ("jcf2", widen_joins(db1))):
        cfg = bench_config(voice_name=f"bench1m_me2_{jcf}", multiepoch=2,
                           length_buckets=[512],
                           join_context_frames=1 if jcf == "jcf1" else 2)
        synth = Synthesiser(cfg, db=db)
        mcds, fluxes = [], []
        for f, w in zip(feats, ref_waves):
            f = f[: 2 * cfg.length_buckets[-1]]
            r = synth.synth_from_features(f)
            ids = np.asarray(r["unit_ids"])
            wave, starts = ola_variant(synth, ids, cfg.taper_length)
            mcds.append(mel_cepstral_distortion(wave, w, SR))
            fluxes.append(flux_at(wave, starts))
        results[jcf] = {"mcd": float(np.nanmean(mcds)),
                        "flux": float(np.nanmean(fluxes)),
                        "n_units": db.n_units}
        log(f"bench1m_me2 {jcf}: MCD {results[jcf]['mcd']:.2f} dB, "
            f"flux {results[jcf]['flux']:.3f}")
        del synth

    print(json.dumps(results))
    with open(os.path.join(cache_dir(), "exp_jcf.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
