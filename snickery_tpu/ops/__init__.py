"""Compute kernels: preselection top-k, Viterbi lattice search, OLA.

These replace the reference's scipy/sklearn KD-tree + numpy DP + python OLA
loops (SURVEY.md §2 rows 3-5, §3.4) with static-shape XLA programs and
Pallas kernels.
"""

from snickery_tpu.ops.topk import topk_preselect
from snickery_tpu.ops.viterbi import viterbi_decode, greedy_decode
from snickery_tpu.ops.ola import overlap_add_units, host_overlap_add

__all__ = [
    "topk_preselect",
    "viterbi_decode",
    "greedy_decode",
    "overlap_add_units",
    "host_overlap_add",
]
