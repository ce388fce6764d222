"""Waveform concatenation: vectorised gather + crossfade overlap-add.

Replaces the reference's per-unit python slice/taper/OLA loop (SURVEY.md
§3.2 hot loop #4) with one gather + one scatter-add, all static shapes
(north star: "epoch-synchronous overlap-add concatenation runs as a
vectorized gather+window kernel").

Placement semantics (documented design — the reference could not be
consulted; see SURVEY.md provenance warning):

- A selected unit's nominal span in the corpus is ``[cut1, cut2)`` (anchor
  epoch to end epoch, ``multiepoch`` pitch periods long).
- Its fragment is extracted with ``taper`` extra samples on each side:
  ``wave[cut1 - taper : cut2 + taper)``.
- Nominal spans are placed back-to-back in the output; fragments overlap
  their neighbours by ``2 * taper`` samples, crossfaded with complementary
  raised-cosine ramps (sum exactly 1).

Consequence: units that are consecutive in the corpus reconstruct the corpus
audio *exactly* in the overlap (both fragments sample identical audio and
the ramps sum to 1) — natural speech passes through the concatenator
untouched, which is also the property the perfect-reconstruction test
asserts (SURVEY.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def crossfade_window(frag_len: jax.Array, max_len: int, taper: int) -> jax.Array:
    """Per-fragment window (n_units, max_len): rises over the first 2*taper
    samples, 1 in the middle, falls over the last 2*taper before frag_len."""
    import numpy as np
    pos = jnp.arange(max_len, dtype=jnp.float32)[None, :]
    L = frag_len.astype(jnp.float32)[:, None]
    t2 = float(2 * taper)
    rise = jnp.clip((pos + 0.5) / t2, 0.0, 1.0)
    fall = jnp.clip((L - pos - 0.5) / t2, 0.0, 1.0)
    rise_w = 0.5 - 0.5 * jnp.cos(jnp.pi * rise)
    fall_w = 0.5 - 0.5 * jnp.cos(jnp.pi * fall)
    win = jnp.minimum(rise_w, fall_w)
    return jnp.where(pos < L, win, 0.0)


@functools.partial(jax.jit, static_argnames=("max_frag", "out_len", "taper"))
def overlap_add_units(
    waves: jax.Array,        # (total_samples,) corpus audio (HBM resident)
    cut_start: jax.Array,    # (U,) int — anchor sample (cut1) per selected unit
    cut_end: jax.Array,      # (U,) int — end sample (cut2) per selected unit
    n_units: jax.Array,      # scalar int — actual number of live units (<= U)
    max_frag: int,           # static: max fragment length incl. 2*taper
    out_len: int,            # static: output buffer length
    taper: int,
) -> tuple[jax.Array, jax.Array]:
    """Concatenate selected units -> (audio (out_len,), total_samples scalar).

    Padded unit slots (index >= n_units) contribute nothing.
    """
    U = cut_start.shape[0]
    span = (cut_end - cut_start).astype(jnp.int32)               # nominal lengths
    u_idx = jnp.arange(U, dtype=jnp.int32)
    live = u_idx < n_units
    span = jnp.where(live, span, 0)
    # output anchor of unit j = taper + sum of previous spans
    anchors = taper + jnp.cumsum(span) - span                    # (U,)
    total = taper * 2 + jnp.sum(span)

    frag_len = jnp.where(live, span + 2 * taper, 0)
    offs = jnp.arange(max_frag, dtype=jnp.int32)[None, :]        # (1, F)
    src = (cut_start.astype(jnp.int32) - taper)[:, None] + offs  # (U, F)
    n_corpus = waves.shape[0]
    src_valid = (src >= 0) & (src < n_corpus) & (offs < frag_len[:, None]) & live[:, None]
    frags = waves[jnp.clip(src, 0, n_corpus - 1)] * src_valid.astype(jnp.float32)

    win = crossfade_window(frag_len, max_frag, taper)
    contrib = frags * win

    dst = (anchors - taper)[:, None] + offs                      # (U, F)
    dst_valid = src_valid & (dst >= 0) & (dst < out_len)
    dst_flat = jnp.where(dst_valid, dst, out_len)                # spill to scratch slot
    out = jnp.zeros((out_len + 1,), jnp.float32).at[dst_flat.reshape(-1)].add(
        (contrib * dst_valid.astype(jnp.float32)).reshape(-1)
    )
    return out[:out_len], total
