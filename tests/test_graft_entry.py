"""Regression guard for the driver entry points (``__graft_entry__.py``).

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(N)`` on a virtual CPU mesh; neither is reached by the
library test suite, so a refactor of ``synth_pipeline_step``'s signature can
silently break them (it did once: a removed ``m_pad`` static arg survived in
``entry()``'s ``functools.partial``).  Keep these smoke tests cheap — tiny
shapes, single compile each.
"""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    unit_ids = np.asarray(out[0])
    assert unit_ids.ndim == 1 and unit_ids.size > 0
    assert (unit_ids >= 0).all()


# dryrun_multichip itself runs production-representative shapes (131k units,
# B=8, T=512) — minutes of compile+run on a 1-core CPU host, so it is NOT in
# the unit suite; the sharded step it wraps is covered at toy shapes by
# tests/test_parallel.py, and the driver executes the full dryrun every round.
