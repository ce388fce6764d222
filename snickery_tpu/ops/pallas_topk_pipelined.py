"""Software-pipelined variant of the fused top-k preselection kernel.

Same exact selection algorithm as ops.pallas_topk (phase/pick-while), but
the grid iterates over target row-tiles only; DB chunks stream through a
manual double-buffered DMA inside the kernel, and the per-chunk schedule is
software-pipelined:

    wait dma(chunk j) -> start dma(chunk j+1) -> ISSUE matmul(chunk j)
    -> run SELECTION on chunk j-1's scores (VPU) while the MXU works

so the MXU (distance matmul) and VPU (selection passes) overlap instead of
serialising — measured ~190 ms and ~260 ms respectively per 1M x 16k step
in the grid-stepped kernel, so overlap targets max() instead of sum().

STATUS: EXPERIMENTAL, NOT WIRED INTO THE PIPELINE.  Measured on v5e it is
*slower* than the grid-stepped kernel (split3: 559 vs 451 ms; highest: 666
vs 596 ms at 1M x 16k) — Mosaic does not in fact overlap the issued matmul
with the subsequent selection inside one fori iteration, and the manual DMA
loop loses the automatic input pipelining of the grid version.  Kept as the
starting point for a revisit (explicit multi-slot DMA queues + splitting
selection across iterations may still unlock the overlap).

Layout tricks:
- the DB is stored TRANSPOSED + AUGMENTED: shape (d_aug, M) where rows
  0..d-1 are (zero-padded) features and the last row is ||u||^2; targets get
  a matching -0.5 column, so ``-2 * dot(db_aug_tile, tgt_aug^T)`` is already
  ``||u||^2 - 2 t.u`` — no separate sqnorm stream, and every DMA slice is
  tile-aligned (d_aug is a multiple of 8; chunk offsets are 128-aligned,
  which Mosaic requires for manual memref slices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snickery_tpu.ops.pallas_topk import BLOCK, _first_argmin_cols

T_TILE = 256
CHUNK = 2048
NB = CHUNK // BLOCK


def _select_into_state(s, res_v, res_c, base_col, k):
    """One exact phase-loop selection over a chunk's transposed scores
    ``s`` (CHUNK, T_TILE), merging into the unsorted (k, T_TILE) state."""
    folded = s.reshape(NB, BLOCK, T_TILE)
    iota0_nb = jax.lax.broadcasted_iota(jnp.int32, (NB, T_TILE), 0)
    iota3_blk = jax.lax.broadcasted_iota(jnp.int32, (NB, BLOCK, T_TILE), 1)
    iota_k0 = jax.lax.broadcasted_iota(jnp.int32, (k, T_TILE), 0)

    def phase_cond(carry):
        fold, rv, rc, phase, done = carry
        return jnp.logical_and(phase < k, jnp.logical_not(done))

    def phase_body(carry):
        fold, rv, rc, phase, _ = carry
        bm = jnp.min(fold, axis=1)
        bai = jnp.min(jnp.where(fold == bm[:, None, :], iota3_blk, BLOCK),
                      axis=1).astype(jnp.int32)

        def pick_cond(st):
            it, wbm, sel_nb, sv, sc = st
            worst = jnp.max(sv, axis=0)
            return jnp.logical_and(it < k,
                                   jnp.any(jnp.min(wbm, axis=0) < worst))

        def pick_body(st):
            it, wbm, sel_nb, sv, sc = st
            m, b = _first_argmin_cols(wbm, iota0_nb, NB)
            onehot = iota0_nb == b[None, :]
            mi = jnp.sum(jnp.where(onehot, bai, 0), axis=0)
            col = b * BLOCK + mi + base_col
            worst = jnp.max(sv, axis=0)
            wslot = jnp.min(jnp.where(sv == worst[None, :], iota_k0, k), axis=0)
            better = m < worst
            put = (iota_k0 == wslot[None, :]) & better[None, :]
            sv = jnp.where(put, m[None, :], sv)
            sc = jnp.where(put, col[None, :], sc)
            return (it + 1, jnp.where(onehot, jnp.inf, wbm),
                    jnp.maximum(sel_nb, onehot.astype(jnp.int32)), sv, sc)

        _, _, sel_nb, rv, rc = jax.lax.while_loop(
            pick_cond, pick_body,
            (jnp.int32(0), bm, jnp.zeros((NB, T_TILE), jnp.int32), rv, rc))

        mask3 = (sel_nb[:, None, :] > 0) & (iota3_blk == bai[:, None, :])
        fold = jnp.where(mask3, jnp.inf, fold)
        kth = jnp.max(rv, axis=0)
        remaining = jnp.min(jnp.min(fold, axis=1), axis=0)
        done = jnp.all(kth < remaining)
        return (fold, rv, rc, phase + 1, done)

    _, rv, rc, _, _ = jax.lax.while_loop(
        phase_cond, phase_body,
        (folded, res_v, res_c, jnp.int32(0), jnp.bool_(False)))
    return rv, rc


def _split3_dot_t(dbt, tgt_aug):
    """bf16_3x (d_aug, CHUNK)^T x (T_TILE, d_aug)^T -> (CHUNK, T_TILE)."""
    db_hi32 = dbt.astype(jnp.bfloat16).astype(jnp.float32)
    tg_hi32 = tgt_aug.astype(jnp.bfloat16).astype(jnp.float32)
    db_hi = db_hi32.astype(jnp.bfloat16)
    tg_hi = tg_hi32.astype(jnp.bfloat16)
    db_lo = (dbt - db_hi32).astype(jnp.bfloat16)
    tg_lo = (tgt_aug - tg_hi32).astype(jnp.bfloat16)
    dims = (((0,), (1,)), ((), ()))
    def d(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)
    return d(db_hi, tg_hi) + d(db_hi, tg_lo) + d(db_lo, tg_hi)


def _kernel(k: int, n_chunks: int, mm_precision: str,
            tgt_ref, dbt_hbm, out_vals_ref, out_cols_ref,
            db_buf, sems):
    tgt_aug = tgt_ref[:]                                # (T_TILE, d_aug)

    def dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            dbt_hbm.at[:, pl.ds(chunk_idx * CHUNK, CHUNK)],
            db_buf.at[slot], sems.at[slot])

    dma(0, 0).start()

    def mm(dbt_tile):
        # dbt_tile (d_aug, CHUNK); scores = ||u||^2 - 2 t.u via augmentation
        if mm_precision == "split3":
            return -2.0 * _split3_dot_t(dbt_tile, tgt_aug)
        return -2.0 * jax.lax.dot_general(
            dbt_tile, tgt_aug, dimension_numbers=(((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)         # (CHUNK, T_TILE)

    def body(j, carry):
        s_prev, res_v, res_c = carry
        slot = j % 2

        dma(slot, j).wait()

        @pl.when(j + 1 < n_chunks)
        def _():
            dma(1 - slot, j + 1).start()

        # issue the MXU work for chunk j FIRST ...
        s_new = mm(db_buf[slot])
        # ... then run the VPU selection for chunk j-1 while the MXU works
        def sel(args):
            rv, rc = args
            return _select_into_state(s_prev, rv, rc, (j - 1) * CHUNK, k)
        res_v, res_c = jax.lax.cond(
            j > 0, sel, lambda args: args, (res_v, res_c))
        return (s_new, res_v, res_c)

    init_state = (
        jnp.zeros((CHUNK, T_TILE), jnp.float32),
        jnp.full((k, T_TILE), jnp.inf, jnp.float32),
        jnp.zeros((k, T_TILE), jnp.int32),
    )
    s_last, res_v, res_c = jax.lax.fori_loop(0, n_chunks, body, init_state)
    res_v, res_c = _select_into_state(
        s_last, res_v, res_c, (n_chunks - 1) * CHUNK, k)

    out_vals_ref[:] = res_v
    out_cols_ref[:] = res_c


@functools.partial(jax.jit, static_argnames=("k", "interpret", "mm_precision"))
def pallas_topk_pipelined(
    targets: jax.Array,       # (T, d) — T % T_TILE == 0
    db: jax.Array,            # (M, d) — M % CHUNK == 0
    k: int,
    interpret: bool = False,
    mm_precision: str = "highest",
) -> tuple[jax.Array, jax.Array]:
    """Pipelined exact top-k; same contract as pallas_topk_preselect."""
    T, d = targets.shape
    M = db.shape[0]
    assert T % T_TILE == 0, f"T={T} must be a multiple of {T_TILE}"
    assert M % CHUNK == 0, f"M={M} must be a multiple of {CHUNK}"
    n_chunks = M // CHUNK

    # transposed + augmented DB: features (zero-padded to d_aug-1) then
    # the ||u||^2 row; targets get zeros then a -0.5 column
    d_aug = -(-(d + 1) // 8) * 8
    sqn = jnp.sum(db * db, axis=-1)
    dbt = jnp.zeros((d_aug, M), jnp.float32)
    dbt = dbt.at[:d, :].set(db.T)
    dbt = dbt.at[d_aug - 1, :].set(sqn)
    tgt = jnp.zeros((T, d_aug), jnp.float32)
    tgt = tgt.at[:, :d].set(targets)
    tgt = tgt.at[:, d_aug - 1].set(-0.5)

    kernel = functools.partial(_kernel, k, n_chunks, mm_precision)
    vals, cols = pl.pallas_call(
        kernel,
        grid=(T // T_TILE,),
        in_specs=[
            pl.BlockSpec((T_TILE, d_aug), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),        # dbt stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((k, T_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, T_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, T), jnp.float32),
            jax.ShapeDtypeStruct((k, T), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d_aug, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tgt, dbt)
    vals_t, cols_t = vals.T, cols.T
    order = jnp.lexsort((cols_t, vals_t), axis=-1)
    return (jnp.take_along_axis(cols_t, order, axis=-1),
            jnp.take_along_axis(vals_t, order, axis=-1))
