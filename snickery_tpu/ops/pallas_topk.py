"""Pallas fused tiled-distance + exact top-k preselection kernel.

THE north-star kernel (BASELINE.json): "KD-tree candidate preselection is
replaced by brute-force fused top-k over the unit database via a Pallas
tiled-distance kernel".

Layout and algorithm (chosen against measured Mosaic/axon behaviour):

- TRANSPOSED scores: the per-step matmul computes (CHUNK, T_TILE) =
  db_tile @ targets_tile^T, so the DB axis is the LEADING dim and folding
  into BLOCK-row sub-blocks is a free leading-dim reshape (Mosaic only
  allows lane-dim splits at 128, but leading-dim splits at any
  granularity).  BLOCK=128 rows x NB=32 blocks per CHUNK=4096 (swept on
  real 1M-unit data, scripts/bench_topk.py).
- Two exact selection loops (static `select` arg):
  * "phase": per phase compute per-block min + in-block argmin (constant
    full passes over the chunk scores, which never leave VMEM); a pick
    while_loop extracts best blocks one at a time while some row still
    has a block whose min beats that row's current worst kept value.
    Phases repeat until the worst kept value strictly undercuts every
    remaining element.
  * "stream": a single pick while_loop; wbm (NB, T) holds each block's
    EXACT current min (extracted elements are masked out of the fold and
    the picked block's min is refreshed to its next min), so the loop
    condition doubles as the exact termination test and the per-phase
    bai/mask/remaining full-fold passes vanish — the constant per-chunk
    cost is ONE full-fold pass (the initial per-block min).
  Both replace the row's worst slot of an UNSORTED k-slot state (two
  k-wide passes, no merge loop); the caller sorts once at the end.
  Exact for any distribution of the top-k across blocks.
- Scalar-loop iterations are the dominant cost on this hardware
  (~0.5 us each in Mosaic); the design minimises iteration count rather
  than vector work.

First-minimum tie-breaking (lowest index) everywhere, matching np.argmin
and the float64 oracle, except among exactly-equal values discovered in
different phases (identical duplicated units — harmless).  Scores are
squared weighted Euclidean distances minus the per-row ||t||^2 constant
(monotonic — identical ranking).

The XLA fallback (ops.topk.topk_preselect) computes the same thing; this
kernel exists because XLA's top_k sorts and per-row gathers dominate the
step time (measured 1.3-2.0 s vs matmul-only 0.33 s at 1M units x 16k
target rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 256       # target rows per grid step (VMEM-bounded: the
                   # while-carried fold array is multi-buffered by Mosaic)
CHUNK = 4096       # DB rows per grid step
BLOCK = 128        # sub-block fold width (leading-dim split: any granularity)
                   # (t_tile, chunk, block) swept on real 1.15M-unit data
                   # (scripts/bench_topk.py, split3cat + stream select):
                   # (256,2048,128)->177ms, (256,4096,128)->170ms,
                   # (512,4096,128)->171ms, (256,8192,128)->176ms,
                   # (256,4096,64)->179ms, (128,2048,128)->197ms
NB = CHUNK // BLOCK


def _first_argmin_cols(vals, iota0, height):
    """(min, first-argmin) along axis 0 (the leading/DB axis)."""
    m = jnp.min(vals, axis=0)
    eq = vals == m[None, :]
    idx = jnp.min(jnp.where(eq, iota0, height), axis=0)
    return m, idx.astype(jnp.int32)


def _split3_dot(db, tgt):
    """bf16_3x f32 matmul (Precision.HIGH semantics — Mosaic lacks HIGH):
    split operands into bf16 hi + residual lo; hi*hi + hi*lo + lo*hi
    recovers ~f32 accuracy (measured ~1e-3 abs on unit-scale 152-dim dots)
    at 3 bf16 MXU passes instead of HIGHEST's 6.  (Pre-splitting the
    operands outside the kernel was measured SLOWER — the casts fuse.)"""
    db_hi32 = db.astype(jnp.bfloat16).astype(jnp.float32)
    tgt_hi32 = tgt.astype(jnp.bfloat16).astype(jnp.float32)
    db_hi = db_hi32.astype(jnp.bfloat16)
    tgt_hi = tgt_hi32.astype(jnp.bfloat16)
    db_lo = (db - db_hi32).astype(jnp.bfloat16)
    tgt_lo = (tgt - tgt_hi32).astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ()))
    def d(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)
    return d(db_hi, tgt_hi) + d(db_hi, tgt_lo) + d(db_lo, tgt_hi)


def _bf16_split(x):
    """(hi, lo) bf16 split of an f32 array: hi + lo ~= x to ~f32 accuracy."""
    hi32 = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi32.astype(jnp.bfloat16), (x - hi32).astype(jnp.bfloat16)


def _cat128(parts):
    """Concatenate along K, zero-padded to a lane multiple of 128 so Mosaic
    needs no relayout."""
    width = sum(p.shape[1] for p in parts)
    pad = (-width) % 128
    if pad:
        parts = parts + [jnp.zeros((parts[0].shape[0], pad), jnp.bfloat16)]
    return jnp.concatenate(parts, axis=1)


def split3cat_db(db):
    """DB-side split3cat operand: [db_hi | db_hi | db_lo], bf16, K padded to
    a 128 multiple.  hi.hi + hi.lo + lo.hi == this . [tgt_hi|tgt_lo|tgt_hi].

    Always computed INSIDE the kernel-wrapper jit (a ~3 ms elementwise pass
    at 1M units).  Precomputing it outside and passing the bf16 array as a
    jit parameter was tried and REVERTED: on this jax/libtpu the kernel
    reads scrambled values from large bf16 parameter arrays at the Pallas
    custom-call boundary (bit-identical operand values, val maxdiff ~500 vs
    the in-jit transform; correct under interpret mode on CPU) — suspected
    bf16 parameter tiling mismatch.  Do not reintroduce without a
    compiled-vs-interpret check at full scale."""
    db_hi, db_lo = _bf16_split(db)
    return _cat128([db_hi, db_hi, db_lo])


def _split3cat_targets(targets):
    tgt_hi, tgt_lo = _bf16_split(targets)
    return _cat128([tgt_hi, tgt_lo, tgt_hi])


def _compute_scores(mm_precision, has_part, has_ling, ling_weights, mask_col,
                    sqn_in_block, tgt_ref, db_ref, sqn_ref,
                    tpart_ref, dpart_ref, tling_ref, dling_ref):
    """Distance scores (CHUNK, T_TILE) for one (db-chunk, target-tile) pair:
    matmul + ||u||^2 constant + optional fused partition masks / quinphone
    penalties."""
    tgt = tgt_ref[:]                                   # (T_TILE, d)
    db = db_ref[:]                                     # (CHUNK, d)
    if sqn_in_block:
        # [data | sqn | ptr] blocks (build_raw_blocks(affine=...)): the
        # precomputed ||u_norm||^2 column is sliced out of the block load
        # BEFORE the lane mask below zeroes it — no separate HBM operand
        # (whose trailing-singleton layout lane-pads 128x: the round-4
        # capacity OOM) and no per-step fused reduce over the whole DB.
        sq = db[:, mask_col:mask_col + 1]              # (CHUNK, 1)
    if mask_col is not None:
        # zero-transient mode: the operand is the resident RAW block whose
        # column ``mask_col`` carries int32 jr-exception pointer BITS
        # (voicedb.device_layout) — as f32 they can be nan/denormal, so
        # mask them out BEFORE any cast or matmul (where drops unselected
        # nans; a multiplicative mask would propagate them)
        lanes = jax.lax.broadcasted_iota(jnp.int32, db.shape, 1)
        db = jnp.where(lanes < mask_col, db, 0.0)
    if mm_precision == "split3":
        cross = _split3_dot(db, tgt)                   # (CHUNK, T_TILE)
    elif mm_precision == "split3cat":
        if mask_col is not None:
            # zero-transient split3cat: the operand is the resident RAW
            # block — split to bf16 hi/lo IN-KERNEL and lane-concatenate to
            # [hi | hi | lo] so the MXU still sees ONE K=pad128(3d) pass
            # (the targets arrived pre-concatenated as [t_hi|t_lo|t_hi]).
            # The casts and the concat fuse into the operand load; no
            # per-step derived DB operand ever exists in HBM.
            db_hi, db_lo = _bf16_split(db)
            parts = [db_hi, db_hi, db_lo]
            pad = tgt.shape[1] - 3 * db.shape[1]
            if pad:
                parts.append(jnp.zeros((db.shape[0], pad), jnp.bfloat16))
            db = jnp.concatenate(parts, axis=1)
        # operands are split and K-concatenated (bf16): ONE MXU pass at
        # K=3d instead of three at K=d — 3d pads to the next 128 multiple
        # (e.g. 453->512) where three separate passes pad to 3*256=768
        # K-units at d=151, a 1.5x MXU-work saving.
        cross = jax.lax.dot_general(
            db, tgt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (CHUNK, T_TILE)
    else:
        cross = jax.lax.dot_general(
            db, tgt, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # (CHUNK, T_TILE)
    if not sqn_in_block:
        sq = sqn_ref[0]                                # (CHUNK, 1)
    s = sq - 2.0 * cross                               # (CHUNK, 1) broadcasts
    if has_part:
        # hard-restrict to matching partition (voice) ids: mismatches can
        # never be selected (inf never beats any kept value)
        mismatch = dpart_ref[0] != tpart_ref[0]        # (CHUNK,1) vs (1,T_TILE)
        s = jnp.where(mismatch, jnp.inf, s)
    if has_ling:
        # fused quinphone penalties (halfphone mode): identical maths to
        # ops.topk.quinphone_penalties — ID_RANK_PENALTY for a halfphone
        # identity mismatch (order-preserving in f32; see const.py) +
        # weight*scale per context-slot mismatch, so scores match the XLA
        # fallback path bit-for-bit.
        dl = dling_ref[0]                              # (CHUNK, 8) int32
        tl = tling_ref[0]                              # (8, T_TILE) int32
        from snickery_tpu.const import ID_RANK_PENALTY
        code_mism = dl[:, 0:1] != tl[0:1, :]           # (CHUNK, T_TILE)
        s = s + jnp.where(code_mism, jnp.float32(ID_RANK_PENALTY), 0.0)
        *ctx_w, scale = ling_weights
        for c, w in enumerate(ctx_w):
            if w == 0.0:
                continue
            mism = (dl[:, c + 1:c + 2] != tl[c + 1:c + 2, :])
            s = s + jnp.float32(w * scale) * mism.astype(jnp.float32)
    return s


def _to_key(s):
    """Order-preserving f32 -> int32 key (total order, +/-inf included):
    non-negative bit patterns map to themselves, negative ones flip all
    magnitude bits (two's-complement trick), so integer < matches f32 <."""
    u = jax.lax.bitcast_convert_type(s, jnp.int32)
    return jnp.where(u < 0, u ^ jnp.int32(0x7FFFFFFF), u)


def _from_key(key):
    """Inverse of :func:`_to_key` for PACKED keys (low bits carry a row
    index): finite packed keys stay below the +inf bit pattern, so clamping
    at it restores exact +inf for never-filled / partition-masked slots."""
    key = jnp.minimum(key, jnp.int32(0x7F800000))
    u = jnp.where(key < 0, key ^ jnp.int32(0x7FFFFFFF), key)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _packed_select(fold, sv0, sc0, base_col, k, nb, block, t_tile):
    """Packed-key selection over one folded score chunk (``select="packed"``).

    ``fold`` is (NB, BLOCK, T) of int32 PACKED keys: an order-preserving
    int transform of the f32 score whose low log2(BLOCK) bits are replaced
    by the row-in-block index.  The per-block min of packed keys therefore
    yields the block's (min value, first argmin row) JOINTLY, so a pick
    needs no full-fold gather of the chosen block — the dominant cost of
    the "stream" design (one (NB, BLOCK, T) pass per pick iteration).

    Picks run on (NB, T)-sized state only, retiring a picked (block, col)
    optimistically; one exact refresh pass per ROUND recomputes every
    block's min above its extraction threshold (packed keys are unique
    within a block, so "strictly greater than the last extracted key" is
    an exact mask).  The round loop repeats until no remaining element
    beats the worst kept — the same exact-termination contract as
    "stream", now in packed order.  Packing perturbs scores by <= BLOCK-1
    ulp (~1.5e-5 relative at BLOCK=128), absorbed by the standard rank
    margin + exact-f32 rescoring, same as the bf16-split matmul noise.
    Exact-f32 value ties still resolve to the LOWEST unit id (row bits
    order in-block ties, first-argmin orders blocks, strictly-better
    replacement keeps the earliest chunk), matching the oracle convention.

    Cost model: ~2 full (NB, BLOCK, T) passes per grid step (score
    epilogue + initial block-min fold) plus one refresh pass per round,
    vs "stream"'s 2 + one per pick iteration.
    """
    imax = jnp.int32(0x7FFFFFFF)
    iota0_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, t_tile), 0)
    iota_k0 = jax.lax.broadcasted_iota(jnp.int32, (k, t_tile), 0)
    bm0 = jnp.min(fold, axis=1)                                # (NB, T) packed
    thr0 = jnp.full((nb, t_tile), jnp.int32(-0x80000000))      # nothing gone

    def round_cond(st):
        rounds, bm, thr, sv, sc = st
        worst = jnp.max(sv, axis=0)                            # (T,) packed
        return jnp.logical_and(
            rounds < k, jnp.any(jnp.min(bm, axis=0) < worst))

    def round_body(st):
        rounds, bm, thr, sv, sc = st

        def pick_cond(pst):
            it, bm, thr, sv, sc = pst
            worst = jnp.max(sv, axis=0)
            return jnp.logical_and(
                it < k, jnp.any(jnp.min(bm, axis=0) < worst))

        def pick_body(pst):
            it, bm, thr, sv, sc = pst
            m, b = _first_argmin_cols(bm, iota0_nb, nb)        # (T,), (T,)
            onehot = iota0_nb == b[None, :]                    # (NB, T)
            mi = m & jnp.int32(block - 1)                      # row from low bits
            col = b * block + mi + base_col
            worst = jnp.max(sv, axis=0)
            wslot = jnp.min(jnp.where(sv == worst[None, :], iota_k0, k),
                            axis=0)                            # (T,)
            better = m < worst
            put = (iota_k0 == wslot[None, :]) & better[None, :]
            sv = jnp.where(put, m[None, :], sv)
            sc = jnp.where(put, col[None, :], sc)
            # optimistic retire: block b yields nothing more for this
            # column until the round's refresh recomputes its true next min
            upd = onehot & better[None, :]
            bm = jnp.where(upd, imax, bm)
            thr = jnp.where(upd, m[None, :], thr)
            return (it + 1, bm, thr, sv, sc)

        _, bm, thr, sv, sc = jax.lax.while_loop(
            pick_cond, pick_body, (jnp.int32(0), bm, thr, sv, sc))
        # exact refresh — THE full-fold pass of this round: per-block min of
        # elements strictly above the block's extraction threshold
        bm = jnp.min(jnp.where(fold > thr[:, None, :], fold, imax), axis=1)
        return (rounds + 1, bm, thr, sv, sc)

    _, _, _, res_v, res_c = jax.lax.while_loop(
        round_cond, round_body, (jnp.int32(0), bm0, thr0, sv0, sc0))
    return res_v, res_c


def _packed3_select(fold, sv0, sc0, base_col, k, nb, block, t_tile):
    """Three-level packed-key selection (``select="packed3"``) — the fast
    path of the exact fallback pair (see the wrapper).

    Measured motivation (real 1.148M-unit voice, 20480 target rows, k=40,
    split3cat, clean one-compile-per-variant timings): FIXED full-fold
    passes are free — they overlap the MXU pipeline (production kernel
    with selection stripped to a block-min: 136 ms; adding the packing
    ops and two more block-min levels: 138 ms) — but ANY full-fold work
    tied to the data-dependent pick loop serialises against it:
    "stream"'s per-pick (NB, BLOCK, T) gather costs +63 ms (199 ms), and
    even an almost-never-executed in-loop refresh that merely CAPTURES
    the fold costs +40 ms by extending its liveness across the loop
    ("packed2" experiment: 190 ms).  A pick loop whose iterations touch
    only (NB, T) state adds just +13 ms (150 ms total).

    packed3 therefore precomputes per-block FIRST, SECOND and THIRD
    minima as fixed passes and lets the pick loop consume up to three
    elements per (block, column) per chunk with NO reference to the fold
    after setup.  A column that would need a FOURTH element from the same
    block of the same chunk — and whose extraction threshold still beats
    its worst kept value at chunk end — raises a per-column OVERFLOW flag
    instead.  The wrapper reruns the exact "stream" kernel under
    ``lax.cond`` iff any column overflowed, so the returned top-k is
    EXACT unconditionally; the flag merely decides which kernel's answer
    is used.  (Per-column pick order is globally increasing, so at most k
    useful extractions happen per column per chunk and the ``it < k``
    bound is exact, not a heuristic.)

    Packed-key order: <= BLOCK-1 ulp score perturbation, absorbed by the
    standard rank margin + exact-f32 rescoring; exact-f32 value ties
    still resolve to the lowest unit id (see _packed_select).

    MEASURED VERDICT (real 1.048M-unit round-3 voice, 20480 rows, k=30,
    split3cat, t_tile=512 — the production tiling): the fast path alone
    is 206 ms vs stream's 195 ms, and 390/20480 columns overflow on the
    natural DB layout even with the deferred threshold test below (runs
    of consecutive near-duplicate epochs share 128-row blocks), so the
    exact fallback always fires (379 ms total).  A golden-ratio stride
    scatter of DB rows collapses overflow to ~2/20480 (bench_topk
    --scatter) but cannot be used physically: the raw device layout
    derives join contexts from ROW ADJACENCY (voicedb.device_layout).
    "stream" therefore stays the default; packed3 remains selectable for
    sweeps (select="packed3diag" times the fast path + reports overflow).

    Returns (state_vals, state_cols, min-pending-threshold (t_tile,) —
    int32 packed key; the kernel accumulates it across chunks and
    compares against the final worst kept value).
    """
    imax = jnp.int32(0x7FFFFFFF)
    iota0_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, t_tile), 0)
    iota_k0 = jax.lax.broadcasted_iota(jnp.int32, (k, t_tile), 0)
    bm1 = jnp.min(fold, axis=1)                                # (NB, T) packed
    bm2 = jnp.min(jnp.where(fold > bm1[:, None, :], fold, imax), axis=1)
    bm3 = jnp.min(jnp.where(fold > bm2[:, None, :], fold, imax), axis=1)
    thr0 = jnp.full((nb, t_tile), jnp.int32(-0x80000000))
    pend0 = jnp.zeros((nb, t_tile), jnp.int32)   # 0/1 (bool folds are a
                                                 # Mosaic pathology)

    def pick_cond(pst):
        it, cur, n2, n3, thr, pend, sv, sc = pst
        worst = jnp.max(sv, axis=0)
        return jnp.logical_and(
            it < k, jnp.any(jnp.min(cur, axis=0) < worst))

    def pick_body(pst):
        it, cur, n2, n3, thr, pend, sv, sc = pst
        m, b = _first_argmin_cols(cur, iota0_nb, nb)           # (T,), (T,)
        onehot = iota0_nb == b[None, :]                        # (NB, T)
        mi = m & jnp.int32(block - 1)
        col = b * block + mi + base_col
        worst = jnp.max(sv, axis=0)
        wslot = jnp.min(jnp.where(sv == worst[None, :], iota_k0, k), axis=0)
        better = m < worst
        put = (iota_k0 == wslot[None, :]) & better[None, :]
        sv = jnp.where(put, m[None, :], sv)
        sc = jnp.where(put, col[None, :], sc)
        upd = onehot & better[None, :]
        # promote the precomputed chain: cur <- n2 <- n3 <- empty; consuming
        # an empty successor marks the block pending (4th element unknown)
        has2 = n2 < imax
        cur = jnp.where(upd, jnp.where(has2, n2, imax), cur)
        pend = jnp.maximum(pend, (upd & ~has2).astype(jnp.int32))
        n2 = jnp.where(upd, n3, n2)
        n3 = jnp.where(upd, imax, n3)
        thr = jnp.where(upd, m[None, :], thr)
        return (it + 1, cur, n2, n3, thr, pend, sv, sc)

    _, _, _, _, thr, pend, res_v, res_c = jax.lax.while_loop(
        pick_cond, pick_body,
        (jnp.int32(0), bm1, bm2, bm3, thr0, pend0, sv0, sc0))
    # exactness bookkeeping: a pending block matters only if its extraction
    # threshold (a strict lower bound on its unseen elements) beats the
    # column's FINAL worst kept value.  Return the min pending threshold —
    # the kernel accumulates it across chunks and compares against the
    # final worst, which is far less conservative than a per-chunk test:
    # during state warm-up (chunk 0 fills all k slots from NB blocks, so
    # some block supplies a 4th element almost surely) `worst` is still
    # huge, but those thresholds are chunk-0 values that end up far above
    # the final worst, so the deferred test clears them.
    imax32 = jnp.int32(0x7FFFFFFF)
    pend_thr = jnp.min(jnp.where(pend > 0, thr, imax32), axis=0)  # (T,)
    return res_v, res_c, pend_thr


def _stream_select(fold, sv0, sc0, base_col, k, nb, block, t_tile):
    """Streaming-pick exact selection over one folded score chunk (see the
    module docstring).  Returns the updated (k, t_tile) state."""
    iota0_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, t_tile), 0)
    iota_k0 = jax.lax.broadcasted_iota(jnp.int32, (k, t_tile), 0)
    iota_blk2 = jax.lax.broadcasted_iota(jnp.int32, (block, t_tile), 0)
    bm0 = jnp.min(fold, axis=1)                                # (NB, T)
    xm0 = jnp.full((nb, t_tile), -jnp.inf, jnp.float32)        # last-extracted value
    xr0 = jnp.full((nb, t_tile), -1, jnp.int32)                # last-extracted row

    def spick_cond(st):
        it, wbm, xm, xr, sv, sc = st
        worst = jnp.max(sv, axis=0)                            # (T,)
        return jnp.logical_and(
            it < k, jnp.any(jnp.min(wbm, axis=0) < worst))

    def spick_body(st):
        it, wbm, xm, xr, sv, sc = st
        m, b = _first_argmin_cols(wbm, iota0_nb, nb)           # (T,), (T,)
        onehot = iota0_nb == b[None, :]                        # (NB, T)
        # gather the picked block's scores: (BLOCK, T) — THE full-fold
        # pass of this iteration (inf-safe: min-select, the fold may
        # hold inf partition masks)
        blk = jnp.min(jnp.where(onehot[:, None, :], fold, jnp.inf),
                      axis=0)                                  # (BLOCK, T)
        # mask the block's already-extracted prefix (lex <= (xm_b, xr_b))
        xm_b = jnp.sum(jnp.where(onehot, xm, 0.0), axis=0)     # (T,)
        xr_b = jnp.sum(jnp.where(onehot, xr, 0), axis=0)       # (T,)
        gone = (blk < xm_b[None, :]) | (
            (blk == xm_b[None, :]) & (iota_blk2 <= xr_b[None, :]))
        blk = jnp.where(gone, jnp.inf, blk)
        mi = jnp.min(jnp.where(blk == m[None, :], iota_blk2, block),
                     axis=0).astype(jnp.int32)                 # (T,)
        col = b * block + mi + base_col
        worst = jnp.max(sv, axis=0)
        wslot = jnp.min(jnp.where(sv == worst[None, :], iota_k0, k),
                        axis=0)                                # (T,)
        better = m < worst
        put = (iota_k0 == wslot[None, :]) & better[None, :]
        sv = jnp.where(put, m[None, :], sv)
        sc = jnp.where(put, col[None, :], sc)
        # advance the extraction threshold and refresh the block's min
        m2 = jnp.min(jnp.where((blk == m[None, :])
                               & (iota_blk2 <= mi[None, :]),
                               jnp.inf, blk), axis=0)          # (T,)
        wbm = jnp.where(onehot, m2[None, :], wbm)
        xm = jnp.where(onehot, m[None, :], xm)
        xr = jnp.where(onehot, mi[None, :], xr)
        return (it + 1, wbm, xm, xr, sv, sc)

    _, _, _, _, res_v, res_c = jax.lax.while_loop(
        spick_cond, spick_body, (jnp.int32(0), bm0, xm0, xr0, sv0, sc0))
    return res_v, res_c


def _topk_kernel(k: int, n_chunks: int, mm_precision: str, has_part: bool,
                 has_ling: bool, ling_weights: tuple, mask_col,
                 sqn_in_block: bool, t_tile: int, chunk: int, block: int,
                 db_major: bool, select: str, *refs):
    nb = chunk // block
    refs = list(refs)
    if sqn_in_block:
        # no standalone sqn operand: ||u_norm||^2 rides in the db block
        tgt_ref, db_ref = refs[:2]
        sqn_ref = None
        refs = refs[2:]
    else:
        tgt_ref, db_ref, sqn_ref = refs[:3]
        refs = refs[3:]
    tpart_ref = dpart_ref = tling_ref = dling_ref = None
    if has_part:
        tpart_ref, dpart_ref = refs[:2]
        refs = refs[2:]
    if has_ling:
        tling_ref, dling_ref = refs[:2]
        refs = refs[2:]
    if select == "packed3":
        (out_vals_ref, out_cols_ref, out_ovf_ref,
         state_vals, state_cols, state_ovf) = refs
    else:
        out_vals_ref, out_cols_ref, state_vals, state_cols = refs
    if db_major:
        # grid (n_chunks, n_tiles): the DB streams from HBM exactly ONCE
        # (670 MB at the 1M-unit bench vs once per tile = 43 GB); per-tile
        # running states live in one full-width VMEM scratch, sliced at the
        # (256-aligned) tile offset.
        j = pl.program_id(0)                 # chunk index (outer)
        sl = pl.ds(pl.program_id(1) * t_tile, t_tile)
    else:
        j = pl.program_id(1)                 # chunk index (inner)
        sl = slice(None)

    @pl.when(j == 0)
    def _():
        if select in ("packed", "packed3"):
            # packed modes keep the running state as int32 sortable keys
            state_vals[:, sl] = jnp.full((k, t_tile), jnp.int32(0x7FFFFFFF),
                                         jnp.int32)
        else:
            state_vals[:, sl] = jnp.full((k, t_tile), jnp.inf, jnp.float32)
        state_cols[:, sl] = jnp.zeros((k, t_tile), jnp.int32)

    s = _compute_scores(mm_precision, has_part, has_ling, ling_weights,
                        mask_col, sqn_in_block, tgt_ref, db_ref, sqn_ref,
                        tpart_ref, dpart_ref, tling_ref, dling_ref)
    base_col = j * chunk

    if select in ("packed", "packed3"):
        # sortable-int key with the row-in-block index in the low bits —
        # fused into the score epilogue pass (see _packed_select)
        key = _to_key(s)
        rowbits = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                   & jnp.int32(block - 1))
        packed = (key & jnp.int32(~(block - 1))) | rowbits
        folded = packed.reshape(nb, block, t_tile)
        if select == "packed3":
            @pl.when(j == 0)
            def _():
                state_ovf[:, sl] = jnp.full((8, t_tile), jnp.int32(0x7FFFFFFF),
                                            jnp.int32)
            res_v, res_c, pend_thr = _packed3_select(
                folded, state_vals[:, sl], state_cols[:, sl], base_col,
                k, nb, block, t_tile)
            state_ovf[:, sl] = jnp.minimum(state_ovf[:, sl], pend_thr[None, :])
        else:
            res_v, res_c = _packed_select(
                folded, state_vals[:, sl], state_cols[:, sl], base_col,
                k, nb, block, t_tile)
        state_vals[:, sl] = res_v
        state_cols[:, sl] = res_c

        @pl.when(j == n_chunks - 1)
        def _():
            out_vals_ref[:] = _from_key(state_vals[:, sl])
            out_cols_ref[:] = state_cols[:, sl]
            if select == "packed3":
                # deferred overflow test: min pending threshold vs FINAL worst
                worst = jnp.max(state_vals[:, sl], axis=0)     # (T,) packed
                out_ovf_ref[:] = (state_ovf[:, sl]
                                  < worst[None, :]).astype(jnp.int32)
        return

    folded = s.reshape(nb, block, t_tile)              # free leading-dim split

    if select == "stream":
        # Streaming-pick selection (see module docstring and _stream_select).
        res_v, res_c = _stream_select(
            folded, state_vals[:, sl], state_cols[:, sl], base_col,
            k, nb, block, t_tile)
        state_vals[:, sl] = res_v
        state_cols[:, sl] = res_c

        @pl.when(j == n_chunks - 1)
        def _():
            out_vals_ref[:] = state_vals[:, sl]
            out_cols_ref[:] = state_cols[:, sl]
        return

    iota0_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, t_tile), 0)
    iota3_blk = jax.lax.broadcasted_iota(jnp.int32, (nb, block, t_tile), 1)
    iota_k0 = jax.lax.broadcasted_iota(jnp.int32, (k, t_tile), 0)

    def phase_cond(carry):
        fold, res_v, res_c, phase, done = carry
        # worst case one block holds all top-k: each phase then extracts
        # a single useful element, so up to k phases may be needed
        return jnp.logical_and(phase < k, jnp.logical_not(done))

    def phase_body(carry):
        fold, res_v, res_c, phase, _ = carry
        bm = jnp.min(fold, axis=1)                                 # (NB, T)
        bai = jnp.min(jnp.where(fold == bm[:, None, :], iota3_blk, block),
                      axis=1).astype(jnp.int32)                    # (NB, T)

        # The state is kept UNSORTED (sorted once by the caller): insertion
        # is replace-the-worst-slot, so each pick costs two k-wide passes
        # instead of a k-iteration merge.  The pick loop is a while_loop
        # that runs only while some row still has a block whose min beats
        # that row's current worst — when the state is warm this is ~1-2
        # iterations per chunk instead of a fixed k.
        def pick_cond(st):
            it, wbm, sel_nb, sv, sc = st
            worst = jnp.max(sv, axis=0)                            # (T,)
            return jnp.logical_and(
                it < k, jnp.any(jnp.min(wbm, axis=0) < worst))

        def pick_body(st):
            it, wbm, sel_nb, sv, sc = st
            m, b = _first_argmin_cols(wbm, iota0_nb, nb)           # (T,), (T,)
            onehot = iota0_nb == b[None, :]                        # (NB, T)
            mi = jnp.sum(jnp.where(onehot, bai, 0), axis=0)        # (T,)
            col = b * block + mi + base_col
            # replace each row's worst state slot if the pick improves it
            worst = jnp.max(sv, axis=0)
            wslot = jnp.min(jnp.where(sv == worst[None, :], iota_k0, k),
                            axis=0)                                # (T,)
            better = m < worst                                     # (T,)
            put = (iota_k0 == wslot[None, :]) & better[None, :]
            sv = jnp.where(put, m[None, :], sv)
            sc = jnp.where(put, col[None, :], sc)
            return (it + 1, jnp.where(onehot, jnp.inf, wbm),
                    jnp.maximum(sel_nb, onehot.astype(jnp.int32)), sv, sc)

        _, _, sel_nb, res_v, res_c = jax.lax.while_loop(
            pick_cond, pick_body,
            (jnp.int32(0), bm, jnp.zeros((nb, t_tile), jnp.int32),
             res_v, res_c))

        # mask extracted elements: each picked block loses its current argmin
        mask3 = (sel_nb[:, None, :] > 0) & (iota3_blk == bai[:, None, :])
        fold = jnp.where(mask3, jnp.inf, fold)

        # exact-termination: worst kept strictly below every remaining element
        kth = jnp.max(res_v, axis=0)
        remaining = jnp.min(jnp.min(fold, axis=1), axis=0)
        done = jnp.all(kth < remaining)
        return (fold, res_v, res_c, phase + 1, done)

    init = (folded, state_vals[:, sl], state_cols[:, sl],
            jnp.int32(0), jnp.bool_(False))
    _, res_v, res_c, _, _ = jax.lax.while_loop(phase_cond, phase_body, init)
    state_vals[:, sl] = res_v
    state_cols[:, sl] = res_c

    @pl.when(j == n_chunks - 1)
    def _():
        out_vals_ref[:] = state_vals[:, sl]
        out_cols_ref[:] = state_cols[:, sl]


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "mm_precision", "sort",
                                    "ling_weights", "t_tile", "chunk",
                                    "block", "db_major", "select",
                                    "zero_transient", "m_rows"))
def pallas_topk_preselect(
    targets: jax.Array,       # (T, d) — T % T_TILE == 0
    db: jax.Array,            # (M, d) — M % CHUNK == 0
    k: int,
    interpret: bool = False,
    mm_precision: str = "highest",   # "highest" (exact f32) | "split3" (bf16_3x)
    sort: bool = True,
    partition: tuple | None = None,  # (tgt_part (T,), db_part (M,)) int32:
                                     # restrict selection to matching ids
    linguistic: tuple | None = None, # (tgt_codes (T,), tgt_ctx (T,5),
                                     #  db_codes (M,), db_ctx (M,5)) int32:
                                     # fused quinphone penalties (halfphone)
    ling_weights: tuple | None = None,  # static (w0..w4, scale); defaults to
                                        # const.QUINPHONE_* when linguistic set
    t_tile: int | None = None,       # target rows per grid step (default T_TILE)
    chunk: int | None = None,        # DB rows per grid step (default CHUNK)
    block: int | None = None,        # sub-block fold width (default BLOCK)
    db_major: bool | None = None,    # grid order: True = DB chunk outer (DB
                                     # streams from HBM once; per-tile states
                                     # in one VMEM scratch).  None = auto
                                     # (on unless the state would not fit)
    select: str = "auto",            # selection loop: "packed" (sortable-int
                                     # keys with the row index packed into
                                     # the low score bits; picks need no
                                     # per-pick full-fold gather — fastest,
                                     # but ranks in packed order: <= BLOCK-1
                                     # ulp score perturbation, requires the
                                     # standard rank margin — see
                                     # _packed_select) | "stream" (single
                                     # EXACT pick loop, one constant
                                     # full-fold pass per chunk + one per
                                     # pick) | "phase" (per-phase bai/mask/
                                     # remaining passes; comparison baseline)
                                     # | "auto": "packed" exactly when the
                                     # mode already carries a rank margin
                                     # (approximate precisions / zero-
                                     # transient — the same condition as
                                     # ops.topk.preselect_margin), "stream"
                                     # for the margin-less exact path
    db_affine: tuple | None = None,  # (mean (d,), std (d,), sqrt_w (d,),
                                     # n_real scalar): ``db`` holds RAW rows
                                     # (voicedb.device_layout) — normalise +
                                     # weight in-jit (fuses with the
                                     # split3cat cast pass) and pin padding
                                     # rows to the 1e6 never-wins sentinel
    zero_transient: bool = False,    # capacity mode (all precisions):
                                     # ``db`` is the FULL resident raw block
                                     # (q, kd+1) incl. the jr-pointer column;
                                     # the kernel consumes it directly with
                                     # the DB affine folded into prescaled
                                     # targets — NO per-step derived DB
                                     # operand is materialised in HBM (see
                                     # the docstring).  Requires db_affine.
    m_rows: int | None = None,       # zero-transient only: DB rows (static,
                                     # % chunk == 0); rows beyond are the
                                     # raw block's halo/exception tail and
                                     # are never visited by the grid
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k nearest DB rows per target row, fully fused.

    Partition contract: a target row whose partition id matches fewer than
    ``k`` DB rows gets its unfilled slots left as (score=inf, index=0) —
    callers must guarantee every live partition has >= k members (the
    Synthesiser validates this at load time) or treat inf-score slots as
    absent.

    Returns (indices (T, k) int32, scores (T, k) f32 ascending — squared
    distances minus ||t||^2, same convention as ops.topk.topk_preselect).

    The phase loop terminates when the k-th best result strictly undercuts
    every remaining element; the iteration bound guarantees enough phases to
    extract k elements even in the degenerate all-in-one-block case.
    """
    if select == "auto":
        # "stream" everywhere: the packed variants were measured SLOWER on
        # real voices (see ROADMAP.md "Measured dead ends" — the fat tail
        # of same-block near-duplicate runs defeats per-block-level
        # extraction, and any full-fold work tied to the pick loop breaks
        # Mosaic's MXU pipelining).  They remain selectable for sweeps.
        select = "stream"
    T_rows = targets.shape[0]
    if t_tile is None:
        # larger tiles amortise per-grid-step overhead (scalar loop entry,
        # state slicing): 512 measured 642 vs 682 ms at 65k rows x 1.15M
        # units; small (streaming) row counts keep the 256 padding quantum
        t_tile = 512 if T_rows % 512 == 0 and T_rows >= 512 else T_TILE
    chunk = CHUNK if chunk is None else chunk
    block = BLOCK if block is None else block
    assert chunk % block == 0
    T, d = targets.shape
    if db_major is None:
        # full-width running state must fit comfortably in VMEM
        db_major = (T * k * 8 <= 8 * 2**20) and (t_tile % 128 == 0)
    assert T % t_tile == 0, f"T={T} must be a multiple of {t_tile}"
    mask_col = None
    comp = None
    if zero_transient:
        # Capacity mode: fold the DB affine into the algebra so the kernel
        # reads the RESIDENT raw block with no derived per-step HBM operand:
        #   u_norm . t_w = u_raw . (t_w * w/std) - mean . (t_w * w/std)
        # The second term is a per-target constant — rank-irrelevant inside
        # a row — dropped in-kernel and COMPENSATED on the returned scores,
        # so callers see the same score convention as every other path.
        # ||u_norm||^2 is a fused reduce over the raw block (reads 4·kd
        # B/row once, materialises only the (M,) vector).  Padding rows
        # (zeros in the raw block) take the same 1e6-affine never-wins
        # sentinel sqn as the derived-operand path.
        assert db_affine is not None, "zero_transient requires db_affine"
        am, astd, aw, n_real = db_affine
        kd = am.shape[0]
        # width kd+2 = [data | sqn | ptr] (sqn baked at voice-prep by
        # build_raw_blocks(affine=...)); kd+1 = legacy [data | ptr]
        assert db.shape[1] in (kd + 1, kd + 2), (db.shape, kd)
        has_sqn_col = db.shape[1] == kd + 2
        M = db.shape[0] if m_rows is None else m_rows
        assert M % chunk == 0, f"m_rows={M} must be a multiple of {chunk}"
        assert M <= db.shape[0], (M, db.shape)
        n_chunks = M // chunk
        scale = aw / astd
        t2 = targets * scale[None, :]
        comp = 2.0 * (t2 @ am)                               # (T,)
        # zero target lanes matching the block's non-data tail (ptr, and
        # sqn when baked) so the db block window can be FULL-width — a
        # narrower (chunk, kd+1) window over a kd+2-wide array is not
        # Mosaic-lowerable (block last-dims must divide (8,128) or equal
        # the array dims)
        targets = jnp.pad(t2, ((0, 0), (0, db.shape[1] - kd)))
        if mm_precision == "split3cat":
            # the DB side is split + lane-concatenated IN-KERNEL from the
            # raw block (see _compute_scores) — only the small target
            # operand is concatenated here
            targets = _split3cat_targets(targets)
        if has_sqn_col:
            # ||u_norm||^2 rides IN the block (column kd, baked at
            # voice-prep): the kernel slices it out of the block load — no
            # per-step fused reduce over the DB and no (n_chunks, chunk, 1)
            # HBM operand whose trailing singleton lane-pads 128x (the
            # round-4 capacity OOM)
            sqn = None
        else:
            from snickery_tpu.voicedb.device_layout import affine_rows
            valid = jnp.arange(M, dtype=jnp.int32) < n_real
            dbn = affine_rows(db[:M, :kd], am, astd, aw, valid, 1e6)
            sqn = jnp.sum(dbn * dbn, axis=-1).reshape(n_chunks, chunk, 1)
        d = db.shape[1]
        mask_col = kd
    else:
        has_sqn_col = False
        M = db.shape[0]
        assert M % chunk == 0, f"M={M} must be a multiple of {chunk}"
        n_chunks = M // chunk
        if db_affine is not None:
            from snickery_tpu.voicedb.device_layout import affine_rows
            am, astd, aw, n_real = db_affine
            valid = jnp.arange(M, dtype=jnp.int32) < n_real
            # fuses with the split3cat cast pass below — no standalone f32
            # derived copy of the DB is kept in HBM
            db = affine_rows(db, am, astd, aw, valid, 1e6)
        sqn = jnp.sum(db * db, axis=-1).reshape(n_chunks, chunk, 1)
        if mm_precision == "split3cat":
            targets = _split3cat_targets(targets)
            db = split3cat_db(db)
            d = targets.shape[1]
    has_part = partition is not None
    has_ling = linguistic is not None

    # operand plan: each entry is (block_shape, kind) with kind "t" (indexed
    # by the target-tile axis) or "c" (indexed by the db-chunk axis); the
    # actual index maps are built per grid layout below.  Target and DB
    # lane widths differ in zero-transient split3cat mode (concatenated
    # bf16 targets vs the raw f32 block).  Blocks with a baked sqn column
    # carry no standalone sqn operand at all.
    spec_plan = [((t_tile, targets.shape[1]), "t"), ((chunk, d), "c")]
    operands = [targets, db]
    if not has_sqn_col:
        spec_plan.append(((1, chunk, 1), "c"))
        operands.append(sqn)
    if has_part:
        tgt_part, db_part = partition
        operands.append(tgt_part.astype(jnp.int32).reshape(T // t_tile, 1, t_tile))
        operands.append(db_part.astype(jnp.int32).reshape(n_chunks, chunk, 1))
        spec_plan.append(((1, 1, t_tile), "t"))
        spec_plan.append(((1, chunk, 1), "c"))
    if has_ling:
        if ling_weights is None:
            from snickery_tpu.const import QUINPHONE_CONTEXT_WEIGHTS, QUINPHONE_SCALE
            ling_weights = tuple(QUINPHONE_CONTEXT_WEIGHTS) + (QUINPHONE_SCALE,)
        tgt_codes, tgt_ctx, db_codes, db_ctx = linguistic
        # pack [code, ctx0..ctx4, 0, 0] into 8 int32 columns (sublane-friendly)
        tl = jnp.concatenate(
            [tgt_codes.astype(jnp.int32)[:, None], tgt_ctx.astype(jnp.int32),
             jnp.zeros((T, 2), jnp.int32)], axis=1)            # (T, 8)
        tl = tl.reshape(T // t_tile, t_tile, 8).transpose(0, 2, 1)  # (Tt, 8, t_tile)
        dl = jnp.concatenate(
            [db_codes.astype(jnp.int32)[:, None], db_ctx.astype(jnp.int32),
             jnp.zeros((M, 2), jnp.int32)], axis=1).reshape(n_chunks, chunk, 8)
        operands.extend([tl, dl])
        spec_plan.append(((1, 8, t_tile), "t"))
        spec_plan.append(((1, chunk, 8), "c"))
    else:
        ling_weights = ()

    def make_specs(idx_t, idx_c):
        specs = []
        for shape, kind in spec_plan:
            f = idx_t if kind == "t" else idx_c
            z = (0,) * (len(shape) - 1)
            specs.append(pl.BlockSpec(
                shape, (lambda f=f, z=z: lambda *g: (f(*g),) + z)(),
                memory_space=pltpu.VMEM))
        return specs

    n_tiles = T // t_tile
    # index helpers: `ti` selects the target-tile grid axis, `ci` the
    # chunk axis — in db_major order the chunk axis is OUTER (axis 0)
    if db_major:
        ti = lambda i, j: j
        ci = lambda i, j: i
    else:
        ti = lambda i, j: i
        ci = lambda i, j: j
    in_specs = make_specs(ti, ci)
    out_map = lambda i, j: (0, ti(i, j))
    grid = ((n_chunks, n_tiles) if db_major else (n_tiles, n_chunks))
    if select in ("packed", "packed3", "packed3diag"):
        assert block & (block - 1) == 0, (
            f"packed select needs a power-of-two block, got {block}")

    def launch(sel):
        """One pallas_call at the chosen selection mode (shared operands)."""
        kernel = functools.partial(_topk_kernel, k, n_chunks, mm_precision,
                                   has_part, has_ling, ling_weights, mask_col,
                                   has_sqn_col, t_tile, chunk, block,
                                   db_major, sel)
        packed_state = sel in ("packed", "packed3")
        scratch_shapes = [
            pltpu.VMEM((k, T if db_major else t_tile),
                       jnp.int32 if packed_state else jnp.float32),
            pltpu.VMEM((k, T if db_major else t_tile), jnp.int32),
        ]
        out_specs = [
            pl.BlockSpec((k, t_tile), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, t_tile), out_map, memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((k, T), jnp.float32),
            jax.ShapeDtypeStruct((k, T), jnp.int32),
        ]
        if sel == "packed3":
            # per-column overflow flags (row 0 meaningful; 8 rows for tiling)
            out_specs.append(pl.BlockSpec((8, t_tile), out_map,
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((8, T), jnp.int32))
            scratch_shapes.append(
                pltpu.VMEM((8, T if db_major else t_tile), jnp.int32))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(*operands)

    ovf_diag = None
    if select == "packed3":
        # fast path + exact fallback: the packed3 kernel precomputes three
        # score levels per block and flags any column that would need a
        # fourth same-block element in one chunk AND whose pending threshold
        # beats the column's final worst kept value; iff any column
        # overflowed (rare — runs of 4+ near-duplicate epochs inside one
        # 128-row block competing for one target), rerun the exact stream
        # kernel.  The returned top-k is exact either way.
        vals, cols, ovf = launch("packed3")
        vals, cols = jax.lax.cond(
            jnp.any(ovf[0] > 0),
            lambda: launch("stream"),
            lambda: (vals, cols))
    elif select == "packed3diag":
        # diagnostic-only (scripts/bench_topk.py): packed3 fast path with NO
        # exact fallback — INEXACT where a column overflowed.  Returns the
        # per-column overflow row as a third output so sweeps can time the
        # fast path alone and measure how often the fallback would fire.
        vals, cols, ovf = launch("packed3")
        ovf_diag = ovf[0]
    else:
        vals, cols = launch(select)
    # the kernel keeps its state unsorted; order ascending by (value, col)
    # here — lexsort matches the oracle's stable-by-index tie-breaking.
    # Callers that treat the k candidates as a SET (the Viterbi pipeline)
    # pass sort=False and skip the lexsort entirely.
    vals_t, cols_t = vals.T, cols.T
    if comp is not None:
        # restore the dropped per-target constant (zero-transient mode):
        # selection is already done, so a per-row shift cannot change it;
        # inf (partition-starved) slots stay inf
        vals_t = vals_t + comp[:, None]
    if not sort:
        if ovf_diag is not None:
            return cols_t, vals_t, ovf_diag
        return cols_t, vals_t
    order = jnp.lexsort((cols_t, vals_t), axis=-1)
    out = (jnp.take_along_axis(cols_t, order, axis=-1),
           jnp.take_along_axis(vals_t, order, axis=-1))
    return out + (ovf_diag,) if ovf_diag is not None else out


def pad_for_pallas(n_rows: int, db_rows: int) -> tuple[int, int]:
    """(padded T, padded M) satisfying the kernel's tiling constraints."""
    T = -(-n_rows // T_TILE) * T_TILE
    M = -(-db_rows // CHUNK) * CHUNK
    return T, M
