#!/usr/bin/env python
"""Batch feature extraction driver.

Role-equivalent of the reference's script/extract_magphase_features.py
(SURVEY.md §2 row 9, §3.3; unverified, mount empty): for every wav in a
directory, produce pitchmarks (native epoch detector replacing the REAPER
subprocess) and the epoch-synchronous mag/real/imag/lf0 stream files the
trainer consumes.

Usage:
    python scripts/extract_magphase_features.py -w WAVDIR -o OUTDIR \
        [-m DIM_MAG] [-p DIM_PHASE] [-s SAMPLE_RATE] [-N MAX_FILES]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from snickery_tpu import utils
from snickery_tpu.features.epochs import detect_epochs
from snickery_tpu.features.magphase import magphase_analysis
from snickery_tpu.io.est import write_est_pitchmarks
from snickery_tpu.io.speech import put_speech, read_wave

logger = utils.logger


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-w", "--wavdir", required=True)
    ap.add_argument("-o", "--outdir", required=True)
    ap.add_argument("-m", "--dim-mag", type=int, default=60)
    ap.add_argument("-p", "--dim-phase", type=int, default=45)
    ap.add_argument("-s", "--sample-rate", type=int, default=0,
                    help="expected sample rate (0 = accept whatever the wavs are)")
    ap.add_argument("-N", "--max-files", type=int, default=0)
    args = ap.parse_args(argv)

    bases = utils.basenames_in(args.wavdir, "wav")
    if args.max_files:
        bases = bases[: args.max_files]
    if not bases:
        logger.error("no wav files in %s", args.wavdir)
        return 1

    pm_dir = utils.safe_makedir(os.path.join(args.outdir, "pm"))
    stream_dirs = {
        s: utils.safe_makedir(os.path.join(args.outdir, s))
        for s in ("mag", "real", "imag", "lf0")
    }

    for i, base in enumerate(bases):
        wave, sr = read_wave(os.path.join(args.wavdir, base + ".wav"))
        if args.sample_rate and sr != args.sample_rate:
            logger.warning("%s: sample rate %d != %d, skipping", base, sr, args.sample_rate)
            continue
        epochs = detect_epochs(wave, sr)
        write_est_pitchmarks(epochs, os.path.join(pm_dir, base + ".pm"), sr)
        streams = magphase_analysis(wave, epochs, sr,
                                    n_mag=args.dim_mag, n_phase=args.dim_phase)
        for s, mat in streams.items():
            put_speech(mat, os.path.join(stream_dirs[s], f"{base}.{s}"))
        logger.info("[%d/%d] %s: %d epochs", i + 1, len(bases), base, len(epochs))
    return 0


if __name__ == "__main__":
    sys.exit(main())
