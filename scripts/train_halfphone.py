#!/usr/bin/env python
"""Reference-shaped entry point: ``python scripts/train_halfphone.py -c CONFIG``.

Thin wrapper over ``snickery_tpu.cli train`` keeping the reference's exact
invocation surface (reference: script/train_halfphone.py — SURVEY.md §1 L3).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snickery_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["train", *sys.argv[1:]]))
