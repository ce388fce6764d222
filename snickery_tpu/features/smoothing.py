"""Join smoothing for the vocoder (magphase) resynthesis path.

Role-equivalent of the reference's ``smoothing/`` join-smoothing utilities
(SURVEY.md §2 row 5 [M]; unverified, mount empty): when audio is rendered by
vocoder resynthesis from selected units' spectral features (rather than by
waveform OLA), discontinuities at unit joins are audible as spectral jumps.
This module smooths the feature trajectory across join boundaries with a
symmetric crossfade.

Vectorised formulation (static shapes, jit-friendly): for a trajectory
``traj`` (F, d) composed of units of ``frames_per_unit`` frames, each join at
frame b blends frames in [b - width, b + width) toward the straight line
between the two units' edge frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("frames_per_unit", "width"))
def smooth_joins(
    traj: jax.Array,           # (F, d) selected-unit feature trajectory
    frames_per_unit: int,
    width: int = 2,
    strength: jax.Array | float = 1.0,
) -> jax.Array:
    """Crossfade-smooth the trajectory around every unit boundary.

    Within ``width`` frames of a join, each frame is pulled toward the
    linear interpolation between the last pre-join and first post-join
    frames; ``strength`` in [0, 1] scales the effect.  Frames further from
    any join are untouched.  Unit interiors (and utterance edges) are
    preserved exactly for ``width <= frames_per_unit // 2``.
    """
    F, d = traj.shape
    k = frames_per_unit
    if F < 2 * k or width < 1:
        return traj
    idx = jnp.arange(F)
    # position of each frame relative to the nearest join boundary
    phase = (idx + width) % k                  # 0 .. k-1; < 2*width means near a join
    near = phase < 2 * width
    # boundary frame index of the join this frame belongs to
    join = ((idx + width) // k) * k
    has_join = (join >= k) & (join < F)
    active = near & has_join
    left = jnp.clip(join - 1, 0, F - 1)
    right = jnp.clip(join, 0, F - 1)
    # linear interpolant between edge frames across the smoothing window
    alpha = (idx - (join - width) + 0.5) / (2.0 * width)       # 0..1 across window
    alpha = jnp.clip(alpha, 0.0, 1.0)
    target = (1.0 - alpha)[:, None] * traj[left] + alpha[:, None] * traj[right]
    # blend weight peaks at the join and decays to 0 at the window edges
    dist = jnp.minimum(phase, 2 * width - 1 - phase)           # 0 at edge
    w = jnp.where(active, (dist + 1.0) / (width + 0.0) / 2.0, 0.0)
    w = jnp.clip(w * jnp.float32(strength), 0.0, 1.0)[:, None]
    return traj * (1.0 - w) + target * w
