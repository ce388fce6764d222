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
import jax.numpy as jnp

from snickery_tpu.const import BIG_PENALTY


def _chunk_scores(targets, db_chunk, db_sqnorm_chunk):
    """Squared Euclidean distances (T, C) via the matmul identity."""
    # ||t - u||^2 = ||t||^2 - 2 t.u + ||u||^2 ; the ||t||^2 term is constant
    # per row and irrelevant for ranking, so we drop it.
    cross = jnp.dot(targets, db_chunk.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return db_sqnorm_chunk[None, :] - 2.0 * cross


def _chunk_topk_hier(scores: jax.Array, k: int, block: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k (smallest) of each row of ``scores`` (T, C) via a
    two-level hierarchy, avoiding a full-width sort.

    1. fold C into C/block blocks and take per-block minima,
    2. take the k best *blocks* per row (sort over C/block, not C),
    3. rerank the k*block member scores exactly.

    Exactness: let x_k be a row's k-th smallest score.  Every element
    <= x_k lies in a block whose min <= x_k, and at most k blocks can have
    min <= x_k (each block-min is itself an element).  So the k best blocks
    by min jointly contain all top-k elements.

    The full-width ``lax.top_k`` is TPU's slowest primitive here (sort
    based); this cuts its width by ``block`` (measured ~5x end-to-end on the
    preselect step at 256k units).
    """
    T, C = scores.shape
    assert C % block == 0
    nb = C // block
    folded = scores.reshape(T, nb, block)
    block_min = jnp.min(folded, axis=2)                       # (T, nb)
    _, top_blocks = jax.lax.top_k(-block_min, min(k, nb))     # (T, kb)
    kb = top_blocks.shape[1]
    members = jnp.take_along_axis(folded, top_blocks[:, :, None], axis=1)
    members = members.reshape(T, kb * block)                  # (T, kb*block)
    neg, pos = jax.lax.top_k(-members, min(k, kb * block))
    # map member position -> original column index
    blk = jnp.take_along_axis(top_blocks, pos // block, axis=1)
    col = blk * block + pos % block
    return -neg, col.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "block"))
def topk_preselect(
    targets: jax.Array,          # (T, d) normalised, pre-weighted target features
    db: jax.Array,               # (M, d) normalised, pre-weighted DB features (M % chunk == 0)
    k: int,
    chunk: int = 8192,
    extra_scores: jax.Array | None = None,   # (T, M) additive penalties, optional
    block: int = 16,
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
    sqnorms = jnp.sum(db * db, axis=-1).reshape(n_chunks, chunk)
    extra = (
        None if extra_scores is None
        else extra_scores.reshape(T, n_chunks, chunk).transpose(1, 0, 2)
    )

    def step(carry, inputs):
        if extra is None:
            ci, db_c, sq_c = inputs
            scores = _chunk_scores(targets, db_c, sq_c)
        else:
            ci, db_c, sq_c, ex_c = inputs
            scores = _chunk_scores(targets, db_c, sq_c) + ex_c
        vals, cols = _chunk_topk_hier(scores, k, block)
        return carry, (vals, cols + ci * chunk)

    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    xs = (chunk_ids, db_chunks, sqnorms) if extra is None else (chunk_ids, db_chunks, sqnorms, extra)
    _, (vals, cols) = jax.lax.scan(step, 0, xs)
    if n_chunks == 1:
        return cols[0], vals[0]
    # (n_chunks, T, k) -> (T, n_chunks * k); final exact merge
    vals = jnp.moveaxis(vals, 0, 1).reshape(T, n_chunks * vals.shape[-1])
    cols = jnp.moveaxis(cols, 0, 1).reshape(T, n_chunks * cols.shape[-1])
    neg, pos = jax.lax.top_k(-vals, k)
    idx = jnp.take_along_axis(cols, pos, axis=1)
    return idx, -neg


def quinphone_penalties(
    target_codes: jax.Array,       # (T,) int32 target halfphone codes
    target_contexts: jax.Array,    # (T, 5) int32 target quinphone codes
    db_codes: jax.Array,           # (M,) int32
    db_contexts: jax.Array,        # (M, 5) int32
    code_mismatch_penalty: float = BIG_PENALTY,
    context_weights: tuple[float, ...] = (1.0, 10.0, 0.0, 10.0, 1.0),
) -> jax.Array:
    """(T, M) additive penalties for linguistic preselection.

    A hard penalty when the halfphone identity differs (the reference's
    halfphone mode only considers same-name units, SURVEY.md §2 row 3), plus
    graded penalties for quinphone context mismatches — immediate neighbours
    (weight 10) dominate second-order context (weight 1), implementing the
    reference's back-off matching as a ranking score.
    """
    hard = jnp.where(
        target_codes[:, None] != db_codes[None, :], code_mismatch_penalty, 0.0
    )
    w = jnp.asarray(context_weights, jnp.float32)
    mism = (target_contexts[:, None, :] != db_contexts[None, :, :]).astype(jnp.float32)
    soft = jnp.einsum("tmc,c->tm", mism, w)
    return hard + soft * 100.0     # context outranks acoustic distance
