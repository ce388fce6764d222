"""Brute-force fused distance + top-k candidate preselection.

Replaces the reference's KD-tree preselection (scipy/sklearn, SURVEY.md §2
row 3) with what the north star prescribes: a tiled brute-force distance +
top-k over the whole unit DB.  On TPU this is *faster* than any tree: the
distance matrix is one big matmul (MXU) and the merge is a running
``lax.top_k`` over DB chunks, so the (T, M) score matrix is never
materialised.

Two implementations:
- ``topk_preselect``         — pure-XLA chunked scan (works everywhere)
- ``ops.pallas_topk``        — Pallas kernel with on-chip partial top-k
                               (imported lazily; TPU only)

Scores are *squared* weighted Euclidean distances (monotonic in the true
Euclidean distance, so the top-k set and its ordering match the reference's
KD-tree query exactly; the synthesiser takes sqrt where true distances are
needed).  An optional additive ``extra_scores`` (T, M) term supports the
linguistic (quinphone-mismatch) preselection mode.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

from snickery_tpu.const import (ID_RANK_PENALTY, PRESELECT_MARGIN,
                                PRESELECT_MARGIN_SPLIT3CAT)


def preselect_margin(use_pallas: bool, mm_precision: str,
                     halfphone: bool = False,
                     zero_transient: bool = False,
                     override: int = -1) -> int:
    """Extra preselect rank slots under approximate kernel precisions.

    The Pallas kernel RANKS with bf16-split matmuls for split3/split3cat;
    selecting k + margin and keeping the exact-f32 top-k after rescoring
    absorbs ranking error at the rank-k boundary (see const.PRESELECT_MARGIN).
    Exact paths need no margin.  Halfphone mode follows the same design:
    its final keep is by :func:`halfphone_exact_rank` (exact f32 squared
    distance + exact penalty constants), so margin slots rescue same-name
    and fallback candidates the approximate kernel ranking misplaced.
    ``zero_transient`` (capacity mode) folds the DB affine into prescaled
    targets, so even "highest" ranks with a differently-rounded f32
    expression than the exact rescoring — give it the same margin.
    ``override`` >= 0 forces an explicit margin (config key
    ``preselect_margin``; used by the bench fidelity sweeps).
    """
    if override >= 0:
        return override
    if use_pallas and (mm_precision != "highest" or zero_transient):
        if mm_precision == "split3cat":
            return PRESELECT_MARGIN_SPLIT3CAT
        return PRESELECT_MARGIN
    return 0


def zero_transient_default(use_pallas: bool, mm_precision: str) -> bool:
    """Central policy: does the Pallas preselect consume the resident raw
    block directly (affine folded into prescaled targets — no per-step
    derived DB operand in HBM)?  Callers may override via their
    ``zero_transient`` static arg (-1 = this policy, 0 = off, 1 = on).

    ON for every precision including split3cat since round 4.  Measured on
    the 1.05M-unit bench voice through the production batched step
    (scripts/exp_fidelity.py, B=32 x T=2048, 65k decoded rows vs exact
    f32): the in-kernel bf16 split + lane-concat form costs the SAME step
    time as the materialised HBM operand (975.3 vs 973.7 ms at margin 10)
    AND fixes the round-3 broad-gate fidelity miss — raw agreement 0.9998
    vs 0.9192, because the materialised bf16 concat operand reaches the
    kernel with scrambled rows (the same bf16-parameter-boundary pathology
    recorded in split3cat_db's docstring, in milder form: margin sweeps
    10->66 moved raw agreement only 0.919->0.928, which rank noise cannot
    explain).  The speed mode therefore also gets the ~20M-unit single-chip
    capacity for free.  See ROADMAP.md round-4 notes.
    """
    return use_pallas


# finite stand-in for +inf inside MXU-based extraction (0 * inf = NaN);
# far above any real score (padded-DB rows reach ~1e14, f32 max 3.4e38)
_FINF = np.float32(3.0e38)


def _chunk_scores(targets, db_chunk, db_sqnorm_chunk):
    """Squared Euclidean distances (T, C) via the matmul identity."""
    # ||t - u||^2 = ||t||^2 - 2 t.u + ||u||^2 ; the ||t||^2 term is constant
    # per row and irrelevant for ranking, so we drop it.
    cross = jnp.dot(targets, db_chunk.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return db_sqnorm_chunk[None, :] - 2.0 * cross


def iterative_topk(vals: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """k smallest values + argmins per row of ``vals`` (T, n), by k rounds of
    (min, argmin, mask).  First-minimum tie-breaking like np.argmin.

    On TPU this beats ``lax.top_k`` for small k over moderate widths: k
    VPU passes instead of a full bitonic sort (measured 127ms vs 291ms for
    k=30 over (16k, 1024) x 64 chunks).
    """
    T, n = vals.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, n), 1)

    def pick(i, st):
        v, outv, outi = st
        a = jnp.argmin(v, axis=1).astype(jnp.int32)
        m = jnp.min(v, axis=1)
        outv = outv.at[:, i].set(m)
        outi = outi.at[:, i].set(a)
        # mask with +inf, not BIG_PENALTY: padded-DB scores (~1e14) exceed
        # BIG_PENALTY and a finite mask could be re-picked
        v = jnp.where(iota == a[:, None], jnp.inf, v)
        return v, outv, outi

    _, outv, outi = jax.lax.fori_loop(
        0, min(k, n), pick,
        (vals, jnp.full((T, k), jnp.inf, jnp.float32),
         jnp.zeros((T, k), jnp.int32)))
    return outv, outi


def _chunk_topk_hier(scores: jax.Array, k: int, block: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k (smallest) of each row of ``scores`` (T, C) via a
    two-level hierarchy, with no sorts and no dynamic gathers.

    1. fold C into C/block blocks and take per-block minima,
    2. take the k best *blocks* per row by argmin-iteration (k VPU passes
       over width C/block),
    3. extract the k*block member scores by an exact one-hot matmul on the
       MXU (0/1 coefficients select f32 values exactly; XLA's dynamic
       per-row gather lowers catastrophically on TPU — measured >1s per
       step — while this is a few ms of matmul),
    4. rerank members by argmin-iteration.

    Exactness: let x_k be a row's k-th smallest score.  Every element
    <= x_k lies in a block whose min <= x_k, and at most k blocks can have
    min <= x_k (each block-min is itself an element).  So the k best blocks
    by min jointly contain all top-k elements.  Tie-breaking follows
    lowest-index-first at both levels, matching the float64 numpy oracle.
    """
    T, C = scores.shape
    assert C % block == 0
    nb = C // block
    # inf scores (partition exclusions) would poison the one-hot MXU
    # extraction below (0 * inf = NaN): clamp to a finite sentinel far above
    # any real score (padded-DB rows reach ~1e14; f32 max is 3.4e38) and
    # restore inf on output so callers can still identify excluded slots.
    scores = jnp.minimum(scores, _FINF)
    folded = scores.reshape(T, nb, block)
    block_min = jnp.min(folded, axis=2)                       # (T, nb)
    kb = min(k, nb)
    _, top_blocks = iterative_topk(block_min, kb)             # (T, kb)
    # one-hot member extraction: (T, kb, nb) @ (T, nb, block) -> (T, kb, block)
    onehot = (top_blocks[:, :, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)).astype(jnp.float32)
    members = jax.lax.dot_general(
        onehot, folded,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                   # (T, kb, block)
    members = members.reshape(T, kb * block)
    vals, pos = iterative_topk(members, min(k, kb * block))
    # member position -> original column: block id via exact integer matmul
    blk = jnp.take_along_axis(top_blocks, pos // block, axis=1)
    col = blk * block + pos % block
    vals = jnp.where(vals >= _FINF, jnp.inf, vals)
    return vals, col.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "block", "ling_weights"))
def topk_preselect(
    targets: jax.Array,          # (T, d) normalised, pre-weighted target features
    db: jax.Array,               # (M, d) normalised, pre-weighted DB features (M % chunk == 0)
    k: int,
    chunk: int = 8192,
    extra_scores: jax.Array | None = None,   # (T, M) additive penalties, optional
    block: int = 16,
    linguistic: tuple | None = None,
    # linguistic = (tgt_codes (T,), tgt_ctx (T,5), db_codes (M,), db_ctx (M,5)):
    # quinphone penalties computed chunk-by-chunk inside the scan (scales to
    # million-unit DBs, unlike a dense (T, M) extra_scores matrix).
    partition: tuple | None = None,
    # partition = (tgt_part (T,), db_part (M,)): hard-restrict candidates to
    # rows whose partition id matches the target's (multi-voice DBs: each
    # utterance selects only from its own voice).  Fused per chunk.
    ling_weights: tuple | None = None,
    # static (w0..w4, scale) quinphone penalty weights; None = const defaults
    db_affine: tuple | None = None,
    # db_affine = (mean (d,), std (d,), sqrt_w (d,), n_real scalar): ``db``
    # holds RAW feature rows (voicedb.device_layout) — normalise + weight
    # them here, in-scan, and pin rows >= n_real (padding) to the 1e6
    # never-wins sentinel.  Saves shipping/storing a derived copy of the DB.
) -> tuple[jax.Array, jax.Array]:
    """Top-k nearest DB rows per target frame (exact).

    Returns (indices (T, k) int32, scores (T, k) f32 — squared distances plus
    penalties, ascending).  Scans the DB in chunks of ``chunk`` rows; within
    each chunk an exact hierarchical top-k (see ``_chunk_topk_hier``) avoids
    full-width sorts; per-chunk winners are merged by one final top-k over
    n_chunks * k entries.  Peak memory is O(T * (chunk + n_chunks * k)).
    """
    T, d = targets.shape
    M = db.shape[0]
    assert M % chunk == 0, f"db rows {M} must be a multiple of chunk {chunk}"
    n_chunks = M // chunk
    db_chunks = db.reshape(n_chunks, chunk, d)
    # with db_affine the normalise/weight transform runs per-chunk INSIDE
    # the scan step (below) so no full-DB derived copy is ever materialised
    sqnorms = (None if db_affine is not None
               else jnp.sum(db * db, axis=-1).reshape(n_chunks, chunk))
    extra = (
        None if extra_scores is None
        else extra_scores.reshape(T, n_chunks, chunk).transpose(1, 0, 2)
    )
    ling = None
    if linguistic is not None:
        tgt_codes, tgt_ctx, db_codes, db_ctx = linguistic
        ling = (
            tgt_codes, tgt_ctx,
            db_codes.reshape(n_chunks, chunk),
            db_ctx.reshape(n_chunks, chunk, db_ctx.shape[-1]),
        )
    part = None
    if partition is not None:
        tgt_part, db_part = partition
        part = (tgt_part, db_part.reshape(n_chunks, chunk))

    def step(carry, inputs):
        inputs = list(inputs)
        if db_affine is None:
            ci, db_c, sq_c = inputs[:3]
            rest = inputs[3:]
        else:
            from snickery_tpu.voicedb.device_layout import affine_rows
            ci, db_c = inputs[:2]
            rest = inputs[2:]
            am, astd, aw, n_real = db_affine
            valid = (ci * chunk
                     + jnp.arange(chunk, dtype=jnp.int32)) < n_real
            db_c = affine_rows(db_c, am, astd, aw, valid, 1e6)
            sq_c = jnp.sum(db_c * db_c, axis=-1)
        scores = _chunk_scores(targets, db_c, sq_c)
        if extra is not None:
            scores = scores + rest.pop(0)
        if ling is not None:
            code_c, ctx_c = rest.pop(0), rest.pop(0)
            if ling_weights is not None:
                scores = scores + quinphone_penalties(
                    ling[0], ling[1], code_c, ctx_c,
                    context_weights=ling_weights[:5], scale=ling_weights[5])
            else:
                scores = scores + quinphone_penalties(ling[0], ling[1], code_c, ctx_c)
        if part is not None:
            # hard-restrict to matching partition (voice) ids with inf —
            # same convention as the Pallas kernel, so downstream exact
            # rescoring can identify excluded slots via isinf regardless
            # of which preselect path produced them
            part_c = rest.pop(0)
            scores = jnp.where(
                part[0][:, None] != part_c[None, :], jnp.inf, scores)
        vals, cols = _chunk_topk_hier(scores, k, block)
        return carry, (vals, cols + ci * chunk)

    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    xs = ([chunk_ids, db_chunks] if sqnorms is None
          else [chunk_ids, db_chunks, sqnorms])
    if extra is not None:
        xs.append(extra)
    if ling is not None:
        xs.extend([ling[2], ling[3]])
    if part is not None:
        xs.append(part[1])
    _, (vals, cols) = jax.lax.scan(step, 0, tuple(xs))
    if n_chunks == 1:
        return cols[0], vals[0]
    # (n_chunks, T, k) -> (T, n_chunks * k); final exact merge
    vals = jnp.moveaxis(vals, 0, 1).reshape(T, n_chunks * vals.shape[-1])
    cols = jnp.moveaxis(cols, 0, 1).reshape(T, n_chunks * cols.shape[-1])
    neg, pos = jax.lax.top_k(-vals, k)
    idx = jnp.take_along_axis(cols, pos, axis=1)
    return idx, -neg


def order_topk_positions(vals: jax.Array, ids: jax.Array, k: int) -> jax.Array:
    """Positions of the k smallest (value, id) pairs per row, ascending —
    an exact drop-in for ``jnp.lexsort((ids, vals), axis=-1)[:, :k]`` over
    narrow candidate sets.

    k argmin sweeps over the (T, n) set instead of a full two-key sort:
    measured 27-35 ms (lexsort) -> ~2 ms at (65536, 40) on v5e.  Ties in
    value break by lowest id, exactly the oracle's (value, index)
    convention.  Rows whose entries are exhausted (all +inf AND already
    extracted) repeat arbitrary positions — callers mask dead rows anyway.
    """
    T, n = vals.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, n), 1)
    big = jnp.int32(2 ** 30)

    # UNROLLED python loop + one stack, not lax.fori_loop: the loop-carried
    # `.at[:, i].set` is a dynamic-minor-dim store at a traced offset —
    # exactly the "dynamic lane stores must be 128-aligned" Mosaic slow
    # path (ARCHITECTURE.md pathology list) — and the fori body boundary
    # blocks XLA from fusing the per-pick elementwise chains.  Isolated at
    # (65536, 48) -> 30 on v5e this runs 3.8 ms and beats both a 3-operand
    # stable lax.sort (3.2 ms but needs the full sort) and a db-major
    # transposed loop (3.6 ms) on simplicity (scripts/exp_order_topk.py);
    # the cost that LOOKED like selection in stage timings was the callers'
    # take_along_axis gathers on the loop's outputs.
    v, idd = vals, ids.astype(jnp.int32)
    outs = []
    for _ in range(min(k, n)):
        m = jnp.min(v, axis=1)
        tied = v == m[:, None]
        sel_id = jnp.min(jnp.where(tied, idd, big), axis=1)
        hit = tied & (idd == sel_id[:, None])
        pos = jnp.min(jnp.where(hit, iota, n), axis=1).astype(jnp.int32)
        outs.append(jnp.minimum(pos, n - 1))
        # retire the extracted entry: value -> +inf AND id -> big (value
        # alone is not enough — partition-starved slots are already inf)
        v = jnp.where(hit, jnp.inf, v)
        idd = jnp.where(hit, big, idd)
    outp = jnp.stack(outs, axis=1)
    if outp.shape[1] < k:       # k > n: keep the zero-filled (T, k) contract
        outp = jnp.pad(outp, ((0, 0), (0, k - outp.shape[1])))
    return outp


def halfphone_exact_rank(
    sq_exact: jax.Array,        # (..., k) exact f32 squared distances
    kernel_scores: jax.Array,   # (..., k) kernel scores (inf = dead slot)
    mism: jax.Array,            # (..., k) bool identity mismatch
    ctx_cand: jax.Array,        # (..., k, 5) candidate quinphone codes
    tgt_ctx: jax.Array,         # (..., 5) target quinphone codes
    ling_weights: tuple | None,
) -> jax.Array:
    """Exact-f32 ranking key for pooled halfphone candidates.

    The kernel RANKS with (possibly bf16-split) approximate scores; the
    final keep + candidate order must instead use the exact f32 version of
    the same key — squared distance + linguistic penalties — so that the
    pool boundary and the Viterbi tie-break order match the float64
    oracle's single-sum (sq + penalty) convention, with the preselect
    margin absorbing kernel-ranking noise at the boundary (the same design
    as epoch mode's exact rescoring).  Penalty constants are exact in f32
    (powers of two / small products), so the only quantisation left is the
    +2^24 identity shift on mismatched candidates (ulp 2.0 — see
    const.ID_RANK_PENALTY).
    """
    from snickery_tpu.const import (ID_RANK_PENALTY, QUINPHONE_CONTEXT_WEIGHTS,
                                    QUINPHONE_SCALE)
    if ling_weights is None:
        ling_weights = (*QUINPHONE_CONTEXT_WEIGHTS, QUINPHONE_SCALE)
    *ctx_w, scale = ling_weights
    pen = jnp.float32(ID_RANK_PENALTY) * mism
    cmism = ctx_cand != tgt_ctx[..., None, :]
    for c, w in enumerate(ctx_w):
        if w:
            pen = pen + jnp.float32(w * scale) * cmism[..., c]
    return jnp.where(jnp.isinf(kernel_scores), jnp.inf, sq_exact + pen)


def halfphone_lattice_mask(ac: jax.Array, mism: jax.Array) -> jax.Array:
    """Identity fallback rule on lattice target costs, in MASK form.

    Mismatched candidates are excluded (BIG_PENALTY) ONLY at steps where a
    live same-name candidate exists; at steps where the same-name pool is
    exhausted the acoustic costs stay untouched, so the acoustically best
    fallback wins exactly as in the float64 oracle.  (An additive
    BIG_PENALTY is equivalent in exact arithmetic — a constant added to
    every candidate of a step shifts all paths equally — but in f32 it
    absorbs the acoustic detail the fallback choice depends on: f32 ulp at
    1e10 is 1024.  Measured: 0.9625 vs 1.000 halfphone oracle agreement.)
    """
    from snickery_tpu.const import BIG_PENALTY
    has_match = jnp.any(~mism & jnp.isfinite(ac), axis=-1)
    return jnp.where(mism & has_match[..., None],
                     jnp.maximum(ac, jnp.float32(BIG_PENALTY)), ac)


def quinphone_penalties(
    target_codes: jax.Array,       # (T,) int32 target halfphone codes
    target_contexts: jax.Array,    # (T, 5) int32 target quinphone codes
    db_codes: jax.Array,           # (M,) int32
    db_contexts: jax.Array,        # (M, 5) int32
    code_mismatch_penalty: float = ID_RANK_PENALTY,
    context_weights: tuple[float, ...] | None = None,
    scale: float | None = None,
) -> jax.Array:
    """(T, M) additive penalties for linguistic preselection.

    A dominating-but-order-preserving penalty when the halfphone identity
    differs (the reference's halfphone mode only considers same-name units,
    SURVEY.md §2 row 3 — see const.ID_RANK_PENALTY for why the value must
    stay within f32 mantissa reach of the acoustic scores), plus
    graded penalties for quinphone context mismatches — immediate neighbours
    (weight 10) dominate second-order context (weight 1), implementing the
    reference's back-off matching as a ranking score.  The scale makes any
    context mismatch outrank acoustic distance (const.QUINPHONE_SCALE;
    configurable via quinphone_penalty_scale).
    """
    from snickery_tpu.const import QUINPHONE_CONTEXT_WEIGHTS, QUINPHONE_SCALE
    if context_weights is None:
        context_weights = QUINPHONE_CONTEXT_WEIGHTS
    if scale is None:
        scale = QUINPHONE_SCALE
    hard = jnp.where(
        target_codes[:, None] != db_codes[None, :], code_mismatch_penalty, 0.0
    )
    w = jnp.asarray(context_weights, jnp.float32)
    mism = (target_contexts[:, None, :] != db_contexts[None, :, :]).astype(jnp.float32)
    soft = jnp.einsum("tmc,c->tm", mism, w)
    return hard + soft * float(scale)
