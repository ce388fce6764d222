#!/usr/bin/env python
"""Reference-shaped entry point: ``python scripts/synth_halfphone.py -c CONFIG``.

Thin wrapper over ``snickery_tpu.cli synth`` keeping the reference's exact
invocation surface (reference: script/synth_halfphone.py — SURVEY.md §1 L4).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snickery_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["synth", *sys.argv[1:]]))
