"""Raw-feature device layout: ship the corpus bits ONCE, derive on device.

The voice DB's three big device arrays are redundant (voicedb/build.py):

- ``join_left[u]``  is the unit's first raw feature frame — i.e. exactly
  ``target_feats[u, :dj]`` (epoch units: ``features[starts]``; halfphone
  units: ``features[e0]``, the first stacked frame in both cases).
- ``join_right[u]`` is the frame AFTER the unit's last centre epoch, which
  for contiguous units is the NEXT unit's first frame:
  ``target_feats[u + 1, :dj]``.  The exceptions — utterance-final units,
  snapped/skipped halfphone boundaries, the last unit — are a per-corpus
  handful (~ one per utterance), detected here by exact float comparison.
- the preselect operand is an affine map of ``target_feats``
  (``((x - mean) / std) * sqrt_w``), recomputed on device in a fused
  elementwise pass (~2 ms at 1M units) instead of being shipped.

So instead of uploading feats (Mp, kd) + jl|jr (Mp, 2*dj) — ~1.9 GB at the
1M-unit bench voice — the device receives ONE raw block of ~(Mp, kd + 1):
a 3x cut in host->device transfer AND resident HBM for an epoch voice
(2x for multiepoch=2), which on the axon tunnel (~40-55 MB/s chunked) is
the difference between ~50 s and ~17 s of upload, and raises the largest
voice that fits one chip by the same factor.

Block layout (per shard; ``ndb`` = db-mesh axis size, 1 for single chip)::

    rows [0, m_s)          raw target_feats rows of this shard (pad rows 0)
    row  m_s               halo (zeros) — safe landing for ``u + 1`` gathers
    rows [m_s+1, q)        exception join_right rows (first dj cols)

    column kd              jr-exception POINTER: 0 for regular rows, else
                           the block-local row holding this unit's true
                           join_right.  int32 BITCAST into the f32 column
                           (the column is only ever gathered and compared,
                           never arithmetic) — exact for any block size,
                           unlike an f32-valued index which loses exactness
                           past 2^24 rows.

The decode-time gather then needs NO extra lookups vs the old layout: the
exact-rescore row gather already fetches each candidate's raw row (whose
first dj columns ARE join_left, and whose last column is the pointer), and
``jr = block[ptr > 0 ? ptr : idx + 1]`` is one gather — the same count and
row volume as the old concatenated-jlr gather.

Replaces the reference's HDF5-resident join-context matrices
(SURVEY.md §2 rows 1, 5: train_halfphone.py cuts and stores both context
frames per unit) with a TPU-first derivation.
"""

from __future__ import annotations

import numpy as np


def build_raw_blocks(
    feats_raw: np.ndarray,     # (m, kd) RAW (unnormalised) unit target features
    jr_raw: np.ndarray,        # (m, dj) RAW join_right rows
    mp: int,                   # padded unit count (multiple of ndb)
    ndb: int = 1,              # db-mesh axis size (shard count)
    affine: tuple | None = None,  # (mean (kd,), std (kd,), sqrt_w (kd,)):
                                  # ALSO bake ||((x-mean)/std)*w||^2 into an
                                  # extra sqn column (see below)
) -> tuple[np.ndarray, int, int]:
    """Build the per-shard raw blocks described in the module docstring.

    Returns ``(blocks (ndb * q, width) f32, q, m_s)`` where ``m_s = mp/ndb``
    is the DB rows per shard and ``q`` the total block rows per shard.
    Sharding ``blocks`` as ``P("db", None)`` gives each device its own
    ``(q, width)`` block with block-LOCAL exception pointers.

    ``width`` is ``kd + 1`` (``[data | ptr]``), or ``kd + 2``
    (``[data | sqn | ptr]``) when ``affine`` is given: column ``kd`` then
    carries the precomputed squared norm of the affine-normalised row
    (padding rows take the 1e6-sentinel norm so they can never win
    preselection).  Baking sqn into the block at voice-prep removes BOTH
    the per-step fused reduce over the whole DB and the lane-padded
    ``(n_chunks, chunk, 1)`` HBM operand the kernel otherwise needs (128x
    padding blowup on the trailing singleton — 4 GiB at 8.4M units; see
    the round-4 capacity OOM analysis in ARCHITECTURE.md).  The pointer
    column stays LAST either way, so ``gather_join_contexts`` is
    layout-agnostic.
    """
    feats_raw = np.ascontiguousarray(feats_raw, np.float32)
    jr_raw = np.ascontiguousarray(jr_raw, np.float32)
    m, kd = feats_raw.shape
    dj = jr_raw.shape[1]
    assert dj <= kd, (dj, kd)
    assert mp % ndb == 0 and mp >= m, (mp, ndb, m)
    m_s = mp // ndb

    # irregular-jr mask by EXACT comparison (the regular case is a bitwise
    # copy of the same source row, so float equality is the right test)
    if m:
        nxt = np.zeros((m, dj), np.float32)
        nxt[: m - 1] = feats_raw[1:, :dj]
        exc_mask = np.any(jr_raw != nxt, axis=1)
        exc_mask[m - 1] = True                     # no successor row
    else:
        exc_mask = np.zeros(0, bool)

    shard_exc: list[np.ndarray] = []
    for s in range(ndb):
        lo, hi = s * m_s, min((s + 1) * m_s, m)
        ids = (np.nonzero(exc_mask[lo:hi])[0] + lo
               if hi > lo else np.zeros(0, np.int64))
        last = (s + 1) * m_s - 1                   # shard's last row, global
        if last < m - 1:
            # its ``u + 1`` falls in the NEXT shard: route through the
            # exception table too (jr_raw holds the true row either way)
            ids = np.union1d(ids, [last])
        shard_exc.append(ids.astype(np.int64))
    e_pad = max([len(i) for i in shard_exc] + [1])
    q = m_s + 1 + e_pad

    width = kd + 1 if affine is None else kd + 2
    ptr_col = width - 1
    if affine is not None:
        mean, std, w = (np.asarray(a, np.float32) for a in affine[:3])
        # same elementwise op order as affine_rows (f32 throughout);
        # the row reduce is numpy (pairwise) vs XLA — LSB-level rounding
        # differences are absorbed by the preselect rank margin and the
        # exact-f32 rescore downstream (fidelity gates re-verified after
        # this change; see tests/test_device_layout.py)
        v = ((feats_raw - mean) / std) * w
        sqn_real = np.sum(v * v, axis=1, dtype=np.float32)
        sent = np.float32(1e6) * w
        sqn_sentinel = np.float32(np.sum(sent * sent, dtype=np.float32))

    blocks = np.zeros((ndb * q, width), np.float32)
    for s in range(ndb):
        base, lo = s * q, s * m_s
        hi = min(lo + m_s, m)
        if hi > lo:
            blocks[base: base + (hi - lo), :kd] = feats_raw[lo:hi]
        if affine is not None:
            # real rows get their norm; DB padding rows [hi-lo, m_s) the
            # never-wins sentinel (halo/exception tail rows stay 0 — the
            # grid never visits them)
            if hi > lo:
                blocks[base: base + (hi - lo), kd] = sqn_real[lo:hi]
            blocks[base + (hi - lo): base + m_s, kd] = sqn_sentinel
        ids = shard_exc[s]
        if len(ids):
            blocks[base + m_s + 1: base + m_s + 1 + len(ids), :dj] = jr_raw[ids]
            ptrs = (m_s + 1 + np.arange(len(ids), dtype=np.int32))
            blocks[base + (ids - lo), ptr_col] = ptrs.view(np.float32)
    return blocks, q, m_s


def affine_rows(x, mean, std, w, valid=None, pad_value=0.0):
    """Device-side ``((x - mean) / std) * w`` over trailing-dim rows, with
    invalid rows pinned to ``pad_value * w`` (same op order as the host
    numpy path in voicedb.db.normalised_features, for f32 parity)."""
    import jax.numpy as jnp
    v = ((x - mean) / std) * w
    if valid is None:
        return v
    return jnp.where(valid[..., None], v, jnp.float32(pad_value) * w)


def gather_join_contexts(raw_rows, raw_block, idx, dj,
                         mean_j, std_j, sqrt_wj, valid):
    """(jl, jr) normalised + weighted join contexts for candidate units.

    ``raw_rows`` are the candidates' already-gathered raw block rows
    (..., kd+1) — their first ``dj`` columns ARE join_left and their last
    column the jr-exception pointer (see the module docstring) — so jl
    costs no extra HBM gather, and jr exactly one (same row volume as the
    old concatenated-jlr gather).  Invalid (padding) candidates get zero
    contexts, matching the old zero-padded jl/jr rows.
    """
    import jax
    import jax.numpy as jnp
    kd = raw_block.shape[1] - 1
    # pointer column carries int32 BITS in an f32 array (see module doc)
    ptr = jax.lax.bitcast_convert_type(raw_rows[..., kd], jnp.int32)
    g = jnp.where(ptr > 0, ptr, idx + 1)
    jr_raw = raw_block[g][..., :dj]
    aff = lambda x: affine_rows(x, mean_j, std_j, sqrt_wj, valid, 0.0)
    return aff(raw_rows[..., :dj]), aff(jr_raw)


def identity_affine(d: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean=0, std=1, w=1) vectors — raw == normalised == weighted.  For
    tests and synthetic callers whose features are already in model space."""
    return (np.zeros(d, np.float32), np.ones(d, np.float32),
            np.ones(d, np.float32))
