"""Pallas fused top-k kernel vs the float64 oracle (interpret mode on CPU;
the compiled path is exercised by bench.py on real TPU hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from snickery_tpu import oracle
from snickery_tpu.ops.pallas_topk import (
    CHUNK, T_TILE, pad_for_pallas, pallas_topk_preselect,
)


@pytest.mark.parametrize(
    "T,M,d,k",
    [(T_TILE, CHUNK, 24, 8),            # single chunk
     (T_TILE, 2 * CHUNK, 24, 30),       # multi chunk
     (2 * T_TILE, 3 * CHUNK, 151, 30)]  # realistic dim, multi tile
)
def test_pallas_topk_exact(rng, T, M, d, k):
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True)
    ref_idx, ref_sq = oracle.preselect(targets, db, k)
    assert (np.asarray(idx) == ref_idx).mean() == 1.0
    true_sq = np.asarray(vals) + (targets ** 2).sum(-1, keepdims=True)
    np.testing.assert_allclose(true_sq, ref_sq, rtol=1e-3, atol=1e-3)


def test_pallas_topk_duplicate_pileup(rng):
    """Worst case: many identical DB rows land the whole top-k in one block.

    Values must still be exact; index order may differ from the oracle only
    among exact ties (identical units — harmless for synthesis)."""
    T, M, d, k = T_TILE, CHUNK, 16, 30
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    db[100:140] = db[50]
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True)
    ref_idx, ref_sq = oracle.preselect(targets, db, k)
    true_sq = np.sort(np.asarray(vals)) + (targets ** 2).sum(-1, keepdims=True)
    np.testing.assert_allclose(true_sq, np.sort(ref_sq), rtol=1e-3, atol=1e-3)
    set_agree = np.mean([
        len(set(np.asarray(idx)[r]) & set(ref_idx[r])) / k for r in range(T)])
    assert set_agree > 0.99


def test_pad_for_pallas():
    T, M = pad_for_pallas(100, 5000)
    assert T % T_TILE == 0 and T >= 100
    assert M % CHUNK == 0 and M >= 5000


def test_pipelined_kernel_exact(rng):
    """Experimental pipelined variant stays correct (interpret mode)."""
    from snickery_tpu.ops.pallas_topk_pipelined import (
        CHUNK as PCHUNK, T_TILE as PT, pallas_topk_pipelined)
    T, M, d, k = PT, 3 * PCHUNK, 151, 20
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    idx, vals = pallas_topk_pipelined(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True)
    ref_idx, ref_sq = oracle.preselect(targets, db, k)
    assert (np.asarray(idx) == ref_idx).mean() == 1.0


def test_pallas_partition_restricts_selection(rng):
    """Partition (multi-voice) masks inside the kernel: selected units always
    match the target's id and agree with the partition-masked oracle."""
    T, M, d, k = T_TILE, CHUNK, 24, 10
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    tgt_part = rng.integers(0, 3, T).astype(np.int32)
    db_part = rng.integers(0, 3, M).astype(np.int32)
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        partition=(jnp.asarray(tgt_part), jnp.asarray(db_part)))
    idx = np.asarray(idx)
    assert (db_part[idx] == tgt_part[:, None]).all()
    extra = np.where(tgt_part[:, None] != db_part[None, :], 1e30, 0.0)
    ref_idx, _ = oracle.preselect(targets, db, k, extra=extra)
    assert (idx == ref_idx).mean() == 1.0
