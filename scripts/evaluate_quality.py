#!/usr/bin/env python
"""Objective quality report: MCD + join discontinuity for synthesised wavs.

Usage:
    python scripts/evaluate_quality.py -s SYNTH_DIR -r REF_WAV_DIR [-c CONFIG]

Pairs files by basename; prints one line per utterance plus a summary, and a
final JSON line with the mean MCD (the reference validated quality by
listening tests — SURVEY.md §4 — so this is the automated stand-in).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snickery_tpu import utils
from snickery_tpu.evaluate import (f0_metrics, join_discontinuity,
                                   mel_cepstral_distortion)
from snickery_tpu.io.speech import read_wave

logger = utils.logger


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--synth-dir", required=True)
    ap.add_argument("-r", "--ref-dir", required=True)
    ap.add_argument("-N", "--max-files", type=int, default=0)
    ap.add_argument("-c", "--config", default="",
                    help="voice config: enables join-discontinuity reporting "
                         "when the synth dir holds <base>.units.npy files "
                         "(synth_halfphone.py --dump-units)")
    args = ap.parse_args(argv)

    db = taper = None
    if args.config:
        from snickery_tpu.config import load_config
        from snickery_tpu.voicedb.db import VoiceDB
        cfg = load_config(args.config)
        db = VoiceDB.load(os.path.join(cfg.workdir, cfg.voice_name + ".voicedb"))
        taper = cfg.taper_length

    bases = sorted(
        os.path.splitext(f)[0] for f in os.listdir(args.synth_dir)
        if f.endswith(".wav"))
    bases = [b for b in bases
             if os.path.exists(os.path.join(args.ref_dir, b + ".wav"))]
    if args.max_files:
        bases = bases[: args.max_files]
    if not bases:
        logger.error("no paired wavs between %s and %s", args.synth_dir, args.ref_dir)
        return 1

    mcds, fluxes, ffes, f0rmses = [], [], [], []
    for base in bases:
        synth, sr = read_wave(os.path.join(args.synth_dir, base + ".wav"))
        ref, sr2 = read_wave(os.path.join(args.ref_dir, base + ".wav"))
        if sr != sr2:
            logger.warning("%s: sample-rate mismatch, skipping", base)
            continue
        mcd = mel_cepstral_distortion(synth, ref, sr)
        mcds.append(mcd)
        prosody = f0_metrics(synth, ref, sr)
        ffes.append(prosody["ffe"])
        f0rmses.append(prosody["f0_rmse_hz"])
        flux_msg = ""
        units_path = os.path.join(args.synth_dir, base + ".units.npy")
        if db is not None and os.path.exists(units_path):
            # same join-sample derivation as bench._join_flux: unit i starts
            # at taper + sum of previous spans; corpus-consecutive units
            # reconstruct the corpus exactly, so only NON-natural joins count
            ids = np.load(units_path)
            cuts = db.cutpoints
            spans = (cuts[ids, 2] - cuts[ids, 1]).astype(np.int64)
            starts = taper + np.cumsum(spans) - spans
            nonnat = np.nonzero(cuts[ids[1:], 1] != cuts[ids[:-1], 2])[0] + 1
            out = join_discontinuity(synth, sr, starts[nonnat])
            fluxes.append(out["ratio"])
            flux_msg = (f", join flux ratio {out['ratio']:.2f} "
                        f"({len(nonnat)} joins)")
        logger.info("%s: MCD %.2f dB, FFE %.3f, f0 RMSE %.1f Hz%s",
                    base, mcd, prosody["ffe"], prosody["f0_rmse_hz"], flux_msg)

    mean_mcd = float(np.nanmean(mcds)) if mcds else float("nan")
    summary = {"metric": "mcd_db", "value": mean_mcd,
               "n_utterances": len(mcds)}
    if ffes and np.isfinite(ffes).any():
        summary["ffe"] = float(np.nanmean(ffes))
    if f0rmses and np.isfinite(f0rmses).any():
        summary["f0_rmse_hz"] = float(np.nanmean(f0rmses))
    finite = [f for f in fluxes if np.isfinite(f)]
    if finite:
        # utterances with zero non-natural joins report nan (nothing to
        # measure) — keep the JSON line strict-parser safe by omitting the
        # key when no utterance had a real join
        summary["join_flux_ratio"] = float(np.mean(finite))
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
