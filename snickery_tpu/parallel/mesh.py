"""Device mesh helpers.

Axes:
- ``data``: data-parallel over utterances (batch axis of a synthesis step,
  utterance axis of DB building).
- ``db``:   row-shards of the unit database (the ~1M-unit axis).  Collectives
  over this axis (all_gather of per-shard top-k) ride the ICI.

The lattice/sequence axis is never sharded: Viterbi is sequential in T and
cheap in memory; the big axis is the DB (SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: int = 0, n_db: int = 1, devices=None) -> Mesh:
    """Build a (data, db) mesh.  n_data=0 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_db < 1 or n % n_db != 0:
        raise ValueError(f"n_db={n_db} must divide device count {n}")
    if n_data == 0:
        n_data = n // n_db
    if n_data * n_db != n:
        raise ValueError(f"mesh {n_data}x{n_db} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_db)
    return Mesh(arr, axis_names=("data", "db"))
