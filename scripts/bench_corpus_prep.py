#!/usr/bin/env python
"""Corpus-prep throughput: epoch detection + feature analysis on bulk audio.

VERDICT round-1 item 8: benchmark the native C++ epoch detector vs the
python fallback at 1-hour-of-audio scale, plus the batched magphase/WORLD
analysis throughput.  Prints times and x-realtime rates; numbers are
recorded in ARCHITECTURE.md.

Usage: python scripts/bench_corpus_prep.py [--minutes 60] [--python-minutes 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60.0,
                    help="audio minutes for the native detector + analysis")
    ap.add_argument("--python-minutes", type=float, default=2.0,
                    help="audio minutes for the python detector (slow)")
    ap.add_argument("--utt-sec", type=float, default=6.0)
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from toyvoice import SR, synth_utterance
    from snickery_tpu.features.epochs import detect_epochs
    from snickery_tpu.features.magphase import magphase_analysis
    from snickery_tpu.features.world import world_analysis

    n_utts = int(args.minutes * 60 / args.utt_sec)
    n_seg = max(2, int(args.utt_sec / 0.15))
    print(f"# generating {args.minutes:.0f} min of synthetic speech "
          f"({n_utts} utts x {args.utt_sec:.0f}s)", file=sys.stderr)
    waves = [synth_utterance(1000 + i, n_segments=n_seg)[0] for i in range(n_utts)]
    audio_sec = sum(len(w) for w in waves) / SR

    # native C++ detector over the full corpus
    t0 = time.time()
    epochs = [detect_epochs(w, SR, use_native=True) for w in waves]
    t_native = time.time() - t0
    print(f"native epoch detector: {audio_sec:.0f}s audio in {t_native:.1f}s "
          f"({audio_sec / t_native:.0f}x realtime)")

    # python detector on a subset
    n_py = max(1, int(args.python_minutes * 60 / args.utt_sec))
    py_audio = sum(len(w) for w in waves[:n_py]) / SR
    t0 = time.time()
    for w in waves[:n_py]:
        detect_epochs(w, SR, use_native=False)
    t_py = time.time() - t0
    print(f"python epoch detector: {py_audio:.0f}s audio in {t_py:.1f}s "
          f"({py_audio / t_py:.0f}x realtime; native speedup "
          f"{(py_audio / t_py and (audio_sec / t_native) / (py_audio / t_py)):.1f}x)")

    # batched magphase analysis (jitted; includes per-bucket compiles)
    t0 = time.time()
    for w, e in zip(waves, epochs):
        magphase_analysis(w, e, SR)
    t_mp = time.time() - t0
    print(f"magphase analysis: {audio_sec:.0f}s audio in {t_mp:.1f}s "
          f"({audio_sec / t_mp:.0f}x realtime)")

    t0 = time.time()
    for w, e in zip(waves, epochs):
        world_analysis(w, e, SR)
    t_w = time.time() - t0
    print(f"world analysis (mgc/bap): {audio_sec:.0f}s audio in {t_w:.1f}s "
          f"({audio_sec / t_w:.0f}x realtime)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
