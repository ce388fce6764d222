"""Multi-chip scale-out: mesh, sharded DB search, batched synthesis.

The reference is a single-process CPU program with no parallelism of any
kind (SURVEY.md §2.10); this package is the capability the north star adds:
unit DBs sharded across chips (row-sharded feature matrix), per-shard local
top-k preselection, all-gathered candidates over the ICI, data-parallel
batched synthesis over utterances (BASELINE.json configs #3/#5).
"""

from snickery_tpu.parallel.mesh import make_mesh
from snickery_tpu.parallel.sharded import (
    ShardedVoice,
    batched_synth_step,
    shard_voice,
    sharded_norm_stats,
)

__all__ = [
    "make_mesh",
    "ShardedVoice",
    "shard_voice",
    "batched_synth_step",
    "sharded_norm_stats",
]
