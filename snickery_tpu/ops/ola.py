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

Implementation note (TPU): XLA lowers ELEMENT-wise gathers/scatters at only
~30M indices/s on this hardware, so the naive formulation (6M+ element
indices at production shapes) costs hundreds of ms.  Everything here is
therefore expressed at 128-sample ROW granularity — row gathers from the
corpus, windows computed arithmetically from index formulas (no gather),
sample-phase alignment via 24 masked static rolls (two-level 8/16 shift
decomposition), and a row scatter-add into the output — ~100x fewer
indices (measured: 273 ms -> ~25 ms at the 1M-unit bench shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def host_overlap_add(
    waves: np.ndarray,       # (total_samples,) corpus audio (host / mmap)
    cut_start: np.ndarray,   # (U,) anchor sample (cut1) per selected unit
    cut_end: np.ndarray,     # (U,) end sample (cut2) per selected unit
    taper: int,
) -> np.ndarray:
    """Numpy mirror of :func:`overlap_add_units` for the
    ``preload_all_waves = False`` path: the corpus audio stays on host
    (mmap-backed), unit ids come back from the device decode, and the
    concatenation runs here.  Sample-identical placement semantics to the
    device kernel (same fragment extraction, same raised-cosine min(rise,
    fall) window, zero outside the corpus), asserted by
    tests/test_ops.py::test_host_ola_matches_device.
    """
    cut_start = np.asarray(cut_start, np.int64)
    cut_end = np.asarray(cut_end, np.int64)
    spans = cut_end - cut_start
    total = int(2 * taper + spans.sum())
    out = np.zeros(total, np.float32)
    n = len(waves)
    t2 = float(2 * taper)
    anchor = taper
    for c1, c2, span in zip(cut_start, cut_end, spans):
        L = int(span) + 2 * taper
        s0 = int(c1) - taper
        frag = np.zeros(L, np.float32)
        lo, hi = max(s0, 0), min(s0 + L, n)
        if hi > lo:
            frag[lo - s0: hi - s0] = waves[lo:hi]
        pos = np.arange(L, dtype=np.float32)
        rise = 0.5 - 0.5 * np.cos(np.pi * np.clip((pos + 0.5) / t2, 0.0, 1.0))
        fall = 0.5 - 0.5 * np.cos(np.pi * np.clip((L - pos - 0.5) / t2, 0.0, 1.0))
        out[anchor - taper: anchor - taper + L] += frag * np.minimum(rise, fall)
        anchor += int(span)
    return out


def _rotate_rows_right(x: jax.Array, e: jax.Array) -> jax.Array:
    """Rotate each row of ``x`` (U, W) right by its own ``e`` in [0, 128).

    Three-level static-roll decomposition (e = 16*e2 + 4*e1 + e0): 8 + 4 +
    4 masked static rolls instead of a per-element gather — pure VPU
    passes.  Any level split is bit-identical (rolls are exact
    permutations); 8/4/4 minimises the pass count (16) vs the two-level
    16 + 8 = 24 (each pass is a full read+select+add over (U, W), so the
    pass count IS the cost at these shapes — measured 74 -> 61 ms on the
    vmapped B=32 production OLA, scripts/exp_stages.py).
    """
    e2 = (e // 16)[:, None]
    e1 = ((e // 4) % 4)[:, None]
    e0 = (e % 4)[:, None]
    y = jnp.zeros_like(x)
    for s in range(8):
        y = y + jnp.where(e2 == s, jnp.roll(x, 16 * s, axis=1), 0.0)
    z = jnp.zeros_like(x)
    for s in range(4):
        z = z + jnp.where(e1 == s, jnp.roll(y, 4 * s, axis=1), 0.0)
    w = jnp.zeros_like(x)
    for s in range(4):
        w = w + jnp.where(e0 == s, jnp.roll(z, s, axis=1), 0.0)
    return w


@functools.partial(jax.jit, static_argnames=("max_frag", "out_len", "taper"))
def overlap_add_units(
    waves: jax.Array,        # (total_samples,) corpus audio (HBM resident;
                             # f32, or int16 at wave_scale quantisation)
    cut_start: jax.Array,    # (U,) int — anchor sample (cut1) per selected unit
    cut_end: jax.Array,      # (U,) int — end sample (cut2) per selected unit
    n_units: jax.Array,      # scalar int — actual number of live units (<= U)
    max_frag: int,           # static: max fragment length incl. 2*taper
    out_len: int,            # static: output buffer length
    taper: int,
    wave_scale: jax.Array | float = 1.0,   # audio = waves * wave_scale
                             # (config waves_dtype="int16": scale = peak/32767)
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
    frag_len = jnp.where(live, span + 2 * taper, 0)              # (U,)

    n = waves.shape[0]
    pad = (-n) % 128
    if pad:
        # bandwidth-bound copy (~1 ms/GB) — callers may pre-pad to skip it
        waves = jnp.concatenate(
            [waves, jnp.zeros((pad,), waves.dtype)])
    waves2d = waves.reshape(-1, 128)
    n_rows_corpus = waves2d.shape[0]

    src0 = cut_start.astype(jnp.int32) - taper                   # frag start
    dst0 = anchors - taper                                       # output start
    sq = src0 // 128
    sr = src0 - sq * 128
    dq = dst0 // 128
    dr = dst0 - dq * 128
    e = dr - sr
    e = jnp.where(e < 0, e + 128, e)                             # [0, 128)
    c = (sr + e - dr) // 128                                     # 0 or 1

    # read window wide enough for phase (<=127) + rotation (<=127) + frag
    W = (-(-(max_frag + 256) // 128)) * 128
    rows_per = W // 128
    rows = sq[:, None] + jnp.arange(rows_per, dtype=jnp.int32)[None, :]
    rows_ok = (rows >= 0) & (rows < n_rows_corpus) & live[:, None]
    x = waves2d[jnp.clip(rows, 0, n_rows_corpus - 1)]            # (U, R, 128)
    # int16 corpora convert on the fly (the gather moves half the bytes);
    # the scale folds into the row mask multiply
    x = (x.astype(jnp.float32)
         * (rows_ok[:, :, None].astype(jnp.float32)
            * jnp.float32(wave_scale))).reshape(U, W)

    # window + fragment mask, computed from index arithmetic (no gather):
    # read-window index i holds fragment position pos = i - sr
    pos = (jnp.arange(W, dtype=jnp.int32)[None, :] - sr[:, None]).astype(jnp.float32)
    L = frag_len.astype(jnp.float32)[:, None]
    t2 = float(2 * taper)
    rise = 0.5 - 0.5 * jnp.cos(jnp.pi * jnp.clip((pos + 0.5) / t2, 0.0, 1.0))
    fall = 0.5 - 0.5 * jnp.cos(jnp.pi * jnp.clip((L - pos - 0.5) / t2, 0.0, 1.0))
    inside = (pos >= 0.0) & (pos < L)
    x = x * jnp.where(inside, jnp.minimum(rise, fall), 0.0)

    # align sample phase to the output grid; masked content is zero, so the
    # roll wrap-around brings in only zeros
    z = _rotate_rows_right(x, e).reshape(U, rows_per, 128)

    out_rows = -(-out_len // 128)
    dst_rows = (dq - c)[:, None] + jnp.arange(rows_per, dtype=jnp.int32)[None, :]
    row_ok = live[:, None] & (dst_rows >= 0) & (dst_rows < out_rows)
    dst_rows = jnp.where(row_ok, dst_rows, out_rows)             # spill row
    out2 = jnp.zeros((out_rows + 1, 128), jnp.float32).at[
        dst_rows.reshape(-1)
    ].add(z.reshape(U * rows_per, 128)
          * row_ok.reshape(-1, 1).astype(jnp.float32))
    return out2[:out_rows].reshape(-1)[:out_len], total
