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

Round 5 (VERDICT r4 item 5): the round-4 run was CONFOUNDED — doubling the
join-context width also raises the effective join weight by ~sqrt(2)
(the L2 norm over 2d dims of same-scale mismatch).  This version adds the
controls that isolate the SHAPE benefit from the WEIGHT side-effect:
  - jcf2_comp : jcf=2 with join_cost_weight scaled by 1/sqrt(2) — width-2
                contexts at MATCHED effective join weight;
  - jcf1_up   : jcf=1 with join_cost_weight scaled by sqrt(2) — does
                raising the weight alone reproduce jcf2's behaviour?
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
    if not os.path.isdir(me2_dir):
        # fall back to the derived me2 inventory the bench me2 mode caches
        # (bit-identical to building at multiepoch=2 on the me1 corpus —
        # tests/test_e2e.py::test_derive_multiepoch_matches_built)
        me2_dir = os.path.join(cache_dir(), "bench1m_me2d.voicedb")
    if not os.path.isdir(me2_dir):
        base = os.path.join(cache_dir(), "bench1m.voicedb")
        if not os.path.isdir(base):
            raise FileNotFoundError(
                "needs a cached me2 voice (run `bench.py --modes epoch,me2` "
                "first) or at least the bench1m voice to derive from")
        from snickery_tpu.voicedb.build import derive_multiepoch
        log("deriving me2 inventory from cached bench1m voice ...")
        db1 = derive_multiepoch(VoiceDB.load(base, mmap=False), 2)
    else:
        db1 = VoiceDB.load(me2_dir)
    results = {}

    db2 = widen_joins(db1)
    sq2 = float(np.sqrt(2.0))
    variants = (
        ("jcf1",      db1, 1, bench.JCW),         # round-4 baseline
        ("jcf1_up",   db1, 1, bench.JCW * sq2),   # weight-only control
        ("jcf2",      db2, 2, bench.JCW),         # round-4 confounded point
        ("jcf2_comp", db2, 2, bench.JCW / sq2),   # width at MATCHED weight
    )
    for name, db, jcf, jcw in variants:
        cfg = bench_config(voice_name=f"bench1m_me2_{name}", multiepoch=2,
                           length_buckets=[512], join_context_frames=jcf,
                           join_cost_weight=jcw)
        synth = Synthesiser(cfg, db=db)
        mcds, fluxes = [], []
        for f, w in zip(feats, ref_waves):
            f = f[: 2 * cfg.length_buckets[-1]]
            r = synth.synth_from_features(f)
            ids = np.asarray(r["unit_ids"])
            wave, starts = ola_variant(synth, ids, cfg.taper_length)
            mcds.append(mel_cepstral_distortion(wave, w, SR))
            fluxes.append(flux_at(wave, starts))
        results[name] = {"mcd": float(np.nanmean(mcds)),
                         "flux": float(np.nanmean(fluxes)),
                         "jcf": jcf, "jcw": round(jcw, 4),
                         "n_units": db.n_units}
        log(f"bench1m_me2 {name} (jcf={jcf}, jcw={jcw:.3f}): "
            f"MCD {results[name]['mcd']:.2f} dB, "
            f"flux {results[name]['flux']:.3f}")
        del synth

    print(json.dumps(results))
    with open(os.path.join(cache_dir(), "exp_jcf.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
