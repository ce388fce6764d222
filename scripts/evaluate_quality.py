#!/usr/bin/env python
"""Objective quality report for synthesised wavs — thin wrapper.

Usage:
    python scripts/evaluate_quality.py -s SYNTH_DIR -r REF_WAV_DIR [-c CONFIG]

Delegates to ``python -m snickery_tpu.cli evaluate`` (the canonical
surface), which pairs files by basename and prints one JSON report with
MCD, NSIM, VDE/GPE/FFE, f0 RMSE and (with ``-c`` + ``--dump-units``
outputs) join-discontinuity flux, per utterance plus means.

For compatibility with this script's ORIGINAL output contract, the last
stdout line is the legacy one-line JSON summary
``{"metric": "mcd_db", "value": ..., "unit": "dB", "n_utterances": N}``
(``--legacy-line`` on the canonical surface; ADVICE r4).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    from snickery_tpu.cli import main as cli_main

    return cli_main(["evaluate", "--legacy-line"]
                    + list(sys.argv[1:] if argv is None else argv))


if __name__ == "__main__":
    sys.exit(main())
