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


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def topk_preselect(
    targets: jax.Array,          # (T, d) normalised, pre-weighted target features
    db: jax.Array,               # (M, d) normalised, pre-weighted DB features (M % chunk == 0)
    k: int,
    chunk: int = 8192,
    extra_scores: jax.Array | None = None,   # (T, M) additive penalties, optional
) -> tuple[jax.Array, jax.Array]:
    """Top-k nearest DB rows per target frame.

    Returns (indices (T, k) int32, scores (T, k) f32 — squared distances plus
    penalties, ascending).  Scans the DB in chunks of ``chunk`` rows, keeping
    a running (T, k) best set, so peak memory is O(T * (chunk + 2k)).
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

    init_scores = jnp.full((T, k), BIG_PENALTY, jnp.float32)
    init_idx = jnp.zeros((T, k), jnp.int32)

    def step(carry, inputs):
        best_scores, best_idx = carry
        if extra is None:
            ci, db_c, sq_c = inputs
            scores = _chunk_scores(targets, db_c, sq_c)
        else:
            ci, db_c, sq_c, ex_c = inputs
            scores = _chunk_scores(targets, db_c, sq_c) + ex_c
        cand_idx = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (T, chunk), 1)
        merged_scores = jnp.concatenate([best_scores, scores], axis=1)
        merged_idx = jnp.concatenate([best_idx, cand_idx], axis=1)
        # top_k on negated scores = k smallest distances
        neg, pos = jax.lax.top_k(-merged_scores, k)
        new_idx = jnp.take_along_axis(merged_idx, pos, axis=1)
        return (-neg, new_idx), None

    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    xs = (chunk_ids, db_chunks, sqnorms) if extra is None else (chunk_ids, db_chunks, sqnorms, extra)
    (scores, idx), _ = jax.lax.scan(step, (init_scores, init_idx), xs)
    return idx, scores


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
