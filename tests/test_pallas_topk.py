"""Pallas fused top-k kernel vs the float64 oracle (interpret mode on CPU;
the compiled path is exercised by bench.py on real TPU hardware).

Each test draws from its OWN fixed-seed generator (not the session-scoped
``rng`` fixture) so results cannot depend on which tests ran before, and
index assertions tolerate swaps among float32 near-ties: two units whose
float64 distances differ below f32 resolution may legitimately change rank
on the f32 kernel path (ADVICE.md round 1).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from snickery_tpu import oracle
from snickery_tpu.ops.pallas_topk import (
    CHUNK, T_TILE, pad_for_pallas, pallas_topk_preselect,
)


def _assert_topk_matches(idx, vals, targets, ref_idx, ref_sq,
                         max_mismatch=0.005):
    """Scores must match the oracle within f32 tolerance everywhere; index
    disagreements are allowed only at near-tied ranks, and only rarely."""
    idx = np.asarray(idx)
    true_sq = (np.asarray(vals).astype(np.float64)
               + (targets.astype(np.float64) ** 2).sum(-1, keepdims=True))
    np.testing.assert_allclose(true_sq, ref_sq, rtol=1e-3, atol=1e-3)
    mism = idx != ref_idx
    if mism.any():
        assert mism.mean() <= max_mismatch, (
            f"index mismatch rate {mism.mean():.5f}")
        # every disagreement must be a near-tie (f32-level score collision)
        np.testing.assert_allclose(true_sq[mism], ref_sq[mism],
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "T,M,d,k,seed",
    [(T_TILE, CHUNK, 24, 8, 11),            # single chunk
     (T_TILE, 2 * CHUNK, 24, 30, 12),       # multi chunk
     (2 * T_TILE, 3 * CHUNK, 151, 30, 13)]  # realistic dim, multi tile
)
def test_pallas_topk_exact(T, M, d, k, seed):
    rng = np.random.default_rng(seed)
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True)
    ref_idx, ref_sq = oracle.preselect(targets, db, k)
    _assert_topk_matches(idx, vals, targets, ref_idx, ref_sq)


def test_pallas_topk_duplicate_pileup():
    """Worst case: many identical DB rows land the whole top-k in one block.

    Values must still be exact; index order may differ from the oracle only
    among exact ties (identical units — harmless for synthesis)."""
    rng = np.random.default_rng(21)
    T, M, d, k = T_TILE, CHUNK, 16, 30
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    db[100:140] = db[50]
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True)
    ref_idx, ref_sq = oracle.preselect(targets, db, k)
    true_sq = np.sort(np.asarray(vals)) + (targets ** 2).sum(-1, keepdims=True)
    np.testing.assert_allclose(true_sq, np.sort(ref_sq), rtol=1e-3, atol=1e-3)
    # identical rows are interchangeable: canonicalise 100..139 -> 50 before
    # comparing candidate sets (ties among exact duplicates may resolve to
    # any member on either side)
    alias = np.arange(M)
    alias[100:140] = 50
    set_agree = np.mean([
        len(set(alias[np.asarray(idx)[r]]) & set(alias[ref_idx[r]]))
        / len(set(alias[ref_idx[r]])) for r in range(T)])
    assert set_agree > 0.999


def test_pallas_topk_tile_major_grid():
    """The non-db-major grid order (used when the full-width state would
    not fit VMEM) selects identically to db-major."""
    rng = np.random.default_rng(71)
    T, M, d, k = 2 * T_TILE, 2 * CHUNK, 24, 10
    targets = jnp.asarray(rng.standard_normal((T, d)).astype(np.float32))
    db = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))
    i1, v1 = pallas_topk_preselect(targets, db, k=k, interpret=True,
                                   db_major=True)
    i2, v2 = pallas_topk_preselect(targets, db, k=k, interpret=True,
                                   db_major=False)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_pad_for_pallas():
    T, M = pad_for_pallas(100, 5000)
    assert T % T_TILE == 0 and T >= 100
    assert M % CHUNK == 0 and M >= 5000


def test_pallas_linguistic_matches_xla():
    """Fused quinphone penalties in the kernel produce the SAME scores and
    selections as the XLA fallback path (identical penalty maths)."""
    from snickery_tpu.ops.topk import topk_preselect
    rng = np.random.default_rng(51)
    T, M, d, k = T_TILE, CHUNK, 24, 12
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    n_names, n_phones = 20, 9
    tgt_codes = rng.integers(0, n_names, T).astype(np.int32)
    tgt_ctx = rng.integers(0, n_phones, (T, 5)).astype(np.int32)
    db_codes = rng.integers(0, n_names, M).astype(np.int32)
    db_ctx = rng.integers(0, n_phones, (M, 5)).astype(np.int32)
    ling = (jnp.asarray(tgt_codes), jnp.asarray(tgt_ctx),
            jnp.asarray(db_codes), jnp.asarray(db_ctx))
    idx_p, val_p = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        linguistic=ling)
    idx_x, val_x = topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, chunk=CHUNK,
        linguistic=ling)
    # same candidate selections (exact same f32 penalty arithmetic)
    assert (np.asarray(idx_p) == np.asarray(idx_x)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(val_p), np.asarray(val_x),
                               rtol=1e-5, atol=1e-4)
    # every same-code candidate really has the target's halfphone identity
    # where one exists in the DB
    sel_codes = db_codes[np.asarray(idx_p)]
    has_same = np.isin(tgt_codes, db_codes)
    assert (sel_codes[has_same, 0] == tgt_codes[has_same]).mean() > 0.99


def test_pallas_linguistic_plus_partition():
    """Halfphone + multi-voice: both masks fuse in one kernel call."""
    rng = np.random.default_rng(61)
    T, M, d, k = T_TILE, CHUNK, 16, 6
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    tgt_codes = rng.integers(0, 5, T).astype(np.int32)
    tgt_ctx = rng.integers(0, 4, (T, 5)).astype(np.int32)
    db_codes = rng.integers(0, 5, M).astype(np.int32)
    db_ctx = rng.integers(0, 4, (M, 5)).astype(np.int32)
    tgt_part = rng.integers(0, 2, T).astype(np.int32)
    db_part = rng.integers(0, 2, M).astype(np.int32)
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        partition=(jnp.asarray(tgt_part), jnp.asarray(db_part)),
        linguistic=(jnp.asarray(tgt_codes), jnp.asarray(tgt_ctx),
                    jnp.asarray(db_codes), jnp.asarray(db_ctx)))
    idx = np.asarray(idx)
    # partition is hard (inf): no cross-voice selection, ever
    assert (db_part[idx] == tgt_part[:, None]).all()


def test_pallas_partition_restricts_selection():
    """Partition (multi-voice) masks inside the kernel: selected units always
    match the target's id and agree with the partition-masked oracle."""
    rng = np.random.default_rng(41)
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
    ref_idx, ref_sq = oracle.preselect(targets, db, k, extra=extra)
    assert (idx == ref_idx).mean() > 0.995


def test_pallas_split3_vs_split3cat():
    """split3cat (one MXU pass at K=3d on pre-concatenated operands) must
    compute the same math as split3 (three K=d passes): raw dot products
    agree to f32 rounding, so selected candidate SETS should be near-
    identical, with disagreements confined to bf16-level near-ties."""
    rng = np.random.default_rng(31)
    T, M, d, k = T_TILE, 2 * CHUNK, 151, 30
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    i3, v3 = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        mm_precision="split3")
    ic, vc = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        mm_precision="split3cat")
    v3, vc = np.asarray(v3), np.asarray(vc)
    i3, ic = np.asarray(i3), np.asarray(ic)
    # candidate sets: allow rank swaps, require near-total set overlap
    overlap = np.mean([
        len(np.intersect1d(i3[t], ic[t])) / k for t in range(T)])
    assert overlap > 0.99, f"candidate-set overlap {overlap:.4f}"
    # kept scores agree to bf16-split rounding wherever indices agree
    same = i3 == ic
    np.testing.assert_allclose(v3[same], vc[same], rtol=2e-3, atol=2e-3)


def test_pallas_split3cat_vs_oracle():
    """split3cat against the float64 oracle at the same tolerance the
    split3 path is held to (bf16-split precision)."""
    rng = np.random.default_rng(32)
    T, M, d, k = T_TILE, 2 * CHUNK, 60, 16
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        mm_precision="split3cat")
    ref_idx, ref_sq = oracle.preselect(targets, db, k)
    true_sq = (np.asarray(vals).astype(np.float64)
               + (targets.astype(np.float64) ** 2).sum(-1, keepdims=True))
    np.testing.assert_allclose(true_sq, ref_sq, rtol=5e-3, atol=5e-3)
    agree = (np.asarray(idx) == ref_idx).mean()
    assert agree > 0.93, f"index agreement {agree:.4f}"


def _raw_voice(rng, m, M, kd):
    """Raw feature rows + jr with utterance-boundary exceptions, padded to
    M rows via voicedb.device_layout (same structure as __graft_entry__)."""
    from snickery_tpu.voicedb.device_layout import build_raw_blocks
    feats = rng.standard_normal((m, kd)).astype(np.float32)
    jr = np.empty((m, kd), np.float32)
    jr[:-1] = feats[1:]
    jr[-1] = rng.standard_normal(kd).astype(np.float32)
    bnd = np.arange(39, m, 40)
    jr[bnd] = rng.standard_normal((len(bnd), kd)).astype(np.float32)
    raw, q, m_s = build_raw_blocks(feats, jr, M, ndb=1)
    return feats, raw


@pytest.mark.parametrize("mm_precision,seed",
                         [("highest", 81), ("split3", 82), ("split3cat", 84)])
def test_pallas_zero_transient_matches_derived(mm_precision, seed):
    """Capacity mode (raw-block operand, affine folded into prescaled
    targets) selects the same candidates as the derived-operand path, and
    the compensated scores match.  Exercises the jr-pointer column mask,
    the q %% chunk != 0 raw tail, and never-wins padding rows."""
    rng = np.random.default_rng(seed)
    m, kd, k = CHUNK + 700, 24, 10
    M = 2 * CHUNK                       # n_real < m_rows: padding exercised
    _, raw = _raw_voice(rng, m, M, kd)
    mean = (0.1 * rng.standard_normal(kd)).astype(np.float32)
    std = rng.uniform(0.5, 2.0, kd).astype(np.float32)
    w = rng.uniform(0.2, 1.0, kd).astype(np.float32)
    aff = (jnp.asarray(mean), jnp.asarray(std), jnp.asarray(w),
           jnp.int32(m))
    T = T_TILE
    targets = rng.standard_normal((T, kd)).astype(np.float32)
    i_zt, v_zt = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(raw), k=k, interpret=True,
        mm_precision=mm_precision, db_affine=aff,
        zero_transient=True, m_rows=M)
    i_d, v_d = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(raw[:M, :kd]), k=k,
        interpret=True, mm_precision=mm_precision, db_affine=aff)
    i_zt, i_d = np.asarray(i_zt), np.asarray(i_d)
    v_zt, v_d = np.asarray(v_zt), np.asarray(v_d)
    assert (i_zt < m).all(), "padding rows must never be selected"
    overlap = np.mean([len(np.intersect1d(i_zt[t], i_d[t])) / k
                       for t in range(T)])
    assert overlap > 0.99, f"candidate-set overlap {overlap:.4f}"
    same = i_zt == i_d
    tol = 1e-4 if mm_precision == "highest" else 2e-3
    np.testing.assert_allclose(v_zt[same], v_d[same], rtol=tol, atol=tol)
    if mm_precision == "split3cat":
        # the zt kernel's in-kernel [hi|hi|lo] lane-concat computes the SAME
        # bf16-split algebra as split3 on identical operands — cross-check
        i_s3, v_s3 = pallas_topk_preselect(
            jnp.asarray(targets), jnp.asarray(raw), k=k, interpret=True,
            mm_precision="split3", db_affine=aff,
            zero_transient=True, m_rows=M)
        np.testing.assert_array_equal(i_zt, np.asarray(i_s3))
        np.testing.assert_allclose(v_zt, np.asarray(v_s3),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mm_precision", ["highest", "split3", "split3cat"])
def test_pallas_zt_sqn_column_matches_fused_reduce(mm_precision):
    """Blocks built with ``affine=`` carry ||u_norm||^2 in column kd
    ([data | sqn | ptr], width kd+2).  The kernel must read it as a
    windowed view and select the same candidates as the legacy width-kd+1
    block whose sqn comes from the per-step fused reduce (numpy vs XLA
    reduce rounding may differ in the last ulp, so values are compared
    with a tiny tolerance and candidate SETS must coincide)."""
    from snickery_tpu.voicedb.device_layout import build_raw_blocks
    rng = np.random.default_rng(4242)
    m, kd, k = CHUNK + 700, 24, 10
    M = 2 * CHUNK
    feats = rng.standard_normal((m, kd)).astype(np.float32)
    jr = np.empty((m, kd), np.float32)
    jr[:-1] = feats[1:]
    jr[-1] = rng.standard_normal(kd).astype(np.float32)
    mean = (0.1 * rng.standard_normal(kd)).astype(np.float32)
    std = rng.uniform(0.5, 2.0, kd).astype(np.float32)
    w = rng.uniform(0.2, 1.0, kd).astype(np.float32)
    legacy, _, _ = build_raw_blocks(feats, jr, M, ndb=1)
    baked, _, _ = build_raw_blocks(feats, jr, M, ndb=1,
                                   affine=(mean, std, w))
    assert baked.shape[1] == kd + 2 and legacy.shape[1] == kd + 1
    # ptr column stays LAST in both layouts (bit-identical pointers)
    np.testing.assert_array_equal(baked[:, kd + 1], legacy[:, kd])
    # baked sqn must equal the affine-normalised row norms (f32)
    v = ((feats - mean) / std) * w
    np.testing.assert_array_equal(
        baked[:m, kd], np.sum(v * v, axis=1, dtype=np.float32))
    aff = (jnp.asarray(mean), jnp.asarray(std), jnp.asarray(w),
           jnp.int32(m))
    T = T_TILE
    targets = rng.standard_normal((T, kd)).astype(np.float32)
    i_b, v_b = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(baked), k=k, interpret=True,
        mm_precision=mm_precision, db_affine=aff,
        zero_transient=True, m_rows=M)
    i_l, v_l = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(legacy), k=k, interpret=True,
        mm_precision=mm_precision, db_affine=aff,
        zero_transient=True, m_rows=M)
    i_b, i_l = np.asarray(i_b), np.asarray(i_l)
    assert (i_b < m).all(), "padding rows must never be selected"
    overlap = np.mean([len(np.intersect1d(i_b[t], i_l[t])) / k
                       for t in range(T)])
    assert overlap > 0.999, f"candidate-set overlap {overlap:.4f}"
    same = i_b == i_l
    assert same.mean() > 0.999
    np.testing.assert_allclose(np.asarray(v_b)[same], np.asarray(v_l)[same],
                               rtol=1e-5, atol=1e-5)


def test_pallas_zero_transient_fused_masks():
    """Partition + quinphone penalties compose with the raw-block operand."""
    rng = np.random.default_rng(83)
    m, kd, k = CHUNK - 100, 16, 6
    M = CHUNK
    _, raw = _raw_voice(rng, m, M, kd)
    from snickery_tpu.voicedb.device_layout import identity_affine
    am, astd, aw = identity_affine(kd)
    aff = (jnp.asarray(am), jnp.asarray(astd), jnp.asarray(aw), jnp.int32(m))
    T = T_TILE
    targets = rng.standard_normal((T, kd)).astype(np.float32)
    tgt_part = rng.integers(0, 2, T).astype(np.int32)
    db_part = rng.integers(0, 2, M).astype(np.int32)
    tgt_codes = rng.integers(0, 5, T).astype(np.int32)
    tgt_ctx = rng.integers(0, 4, (T, 5)).astype(np.int32)
    db_codes = rng.integers(0, 5, M).astype(np.int32)
    db_ctx = rng.integers(0, 4, (M, 5)).astype(np.int32)
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(raw), k=k, interpret=True,
        mm_precision="highest",
        partition=(jnp.asarray(tgt_part), jnp.asarray(db_part)),
        linguistic=(jnp.asarray(tgt_codes), jnp.asarray(tgt_ctx),
                    jnp.asarray(db_codes), jnp.asarray(db_ctx)),
        db_affine=aff, zero_transient=True, m_rows=M)
    idx, vals = np.asarray(idx), np.asarray(vals)
    live = np.isfinite(vals)
    assert (db_part[idx][live] == np.broadcast_to(
        tgt_part[:, None], idx.shape)[live]).all()
    assert (idx[live] < m).all()


def test_pallas_packed_select_margin_coverage():
    """select="packed" (sortable-int keys, row index in the low score bits)
    ranks in PACKED order — a <= BLOCK-1 ulp (~1.5e-5 relative) score
    perturbation — so its contract is the one the pipeline consumes: the
    oracle's exact top-k is COVERED by the packed top-(k + margin), and the
    returned (unpacked) scores match true distances to well below the
    margin the rescoring absorbs.  Negative scores included (targets offset
    so the -2 t.u cross term dominates) — exercises the negative branch of
    the key transform."""
    from snickery_tpu.const import PRESELECT_MARGIN
    rng = np.random.default_rng(61)
    T, M, d, k = T_TILE, 3 * CHUNK, 48, 30
    targets = (rng.standard_normal((T, d)) + 2.0).astype(np.float32)
    db = (rng.standard_normal((M, d)) + 2.0).astype(np.float32)
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k + PRESELECT_MARGIN,
        interpret=True, select="packed")
    vals = np.asarray(vals)
    idx = np.asarray(idx)
    assert (vals < 0).any(), "test should exercise negative scores"
    ref_idx, ref_sq = oracle.preselect(targets, db, k)
    covered = np.mean([
        len(np.intersect1d(idx[t], ref_idx[t])) / k for t in range(T)])
    assert covered == 1.0, f"exact top-{k} coverage {covered:.5f}"
    # unpacked scores = true squared distances (minus ||t||^2) to packing
    # precision: recompute exactly in f64 at the selected indices
    true_sq = ((db[idx].astype(np.float64)
                - targets[:, None, :].astype(np.float64)) ** 2).sum(-1)
    got_sq = (vals.astype(np.float64)
              + (targets.astype(np.float64) ** 2).sum(-1, keepdims=True))
    np.testing.assert_allclose(got_sq, true_sq, rtol=1e-4, atol=1e-4)


def test_pallas_packed_select_one_block_pileup():
    """Worst case for the packed round loop: the entire top-k sits inside a
    single 128-row block of a single chunk, so every round's refresh
    reveals exactly one further element (k rounds).  The candidate set must
    still be exact."""
    rng = np.random.default_rng(62)
    T, M, d, k = T_TILE, 2 * CHUNK, 16, 12
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32) + 40.0
    # rows 256..267 are near-exact hits for every target (tiny jitter keeps
    # scores distinct, so ranking is unambiguous)
    base = rng.standard_normal(d).astype(np.float32)
    for i in range(k):
        db[256 + i] = base + 1e-3 * i
    targets[:] = base + 1e-4 * rng.standard_normal((T, d)).astype(np.float32)
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        select="packed")
    idx = np.sort(np.asarray(idx), axis=-1)
    np.testing.assert_array_equal(
        idx, np.tile(np.arange(256, 256 + k), (T, 1)))


def test_pallas_packed_select_matches_stream():
    """packed and stream selections agree: same candidate sets and (away
    from packing-level ties) the same scores, under split3cat + partition
    masks (inf scores ride the int key domain and unpack to exact inf in
    starved slots)."""
    rng = np.random.default_rng(63)
    T, M, d, k = T_TILE, 2 * CHUNK, 151, 20
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    tgt_part = rng.integers(0, 4, T).astype(np.int32)
    db_part = rng.integers(0, 4, M).astype(np.int32)
    # one starved partition id with < k members
    tgt_part[:8] = 9
    db_part[:5] = 9
    part = (jnp.asarray(tgt_part), jnp.asarray(db_part))
    i_s, v_s = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        mm_precision="split3cat", partition=part, select="stream")
    i_p, v_p = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        mm_precision="split3cat", partition=part, select="packed")
    i_s, i_p = np.asarray(i_s), np.asarray(i_p)
    v_s, v_p = np.asarray(v_s), np.asarray(v_p)
    # starved rows: exactly the 5 members selected, the rest inf in BOTH
    assert np.isinf(v_s[:8, 5:]).all() and np.isinf(v_p[:8, 5:]).all()
    np.testing.assert_array_equal(np.sort(i_s[:8, :5]), np.sort(i_p[:8, :5]))
    # both rank the SAME split3cat scores; they may differ only at
    # packing-level near-ties (<= BLOCK-1 ulp).  High-dim iid gaussians
    # concentrate distances, so the rank-k gap is often inside that band —
    # require high overlap and that every set difference is a near-tie.
    overlap = np.mean([
        len(np.intersect1d(i_s[t], i_p[t])) / k for t in range(T)])
    assert overlap > 0.95, f"candidate-set overlap {overlap:.4f}"
    kth = np.sort(v_s, axis=-1)[:, -1]
    for t in range(T):
        only_p = np.setdiff1d(i_p[t], i_s[t])
        if len(only_p):
            vp = v_p[t][np.isin(i_p[t], only_p)]
            np.testing.assert_allclose(vp, kth[t] * np.ones_like(vp),
                                       rtol=5e-4, atol=5e-4)
    same = i_s == i_p
    np.testing.assert_allclose(v_s[same], v_p[same], rtol=1e-4, atol=1e-4)


def test_pallas_packed_select_grid_order_invariant():
    """packed selection is identical across db-major / tile-major grids."""
    rng = np.random.default_rng(64)
    T, M, d, k = 2 * T_TILE, 2 * CHUNK, 24, 10
    targets = jnp.asarray(rng.standard_normal((T, d)).astype(np.float32))
    db = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))
    i1, v1 = pallas_topk_preselect(targets, db, k=k, interpret=True,
                                   select="packed", db_major=True)
    i2, v2 = pallas_topk_preselect(targets, db, k=k, interpret=True,
                                   select="packed", db_major=False)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_pallas_packed3_margin_coverage_and_fallback():
    """select="packed3" (three precomputed block levels + overflow
    fallback): exact top-k coverage within the rank margin on ordinary
    data, and EXACT results when a pileup forces the overflow fallback
    (many near-duplicate rows in one 128-row block)."""
    from snickery_tpu.const import PRESELECT_MARGIN
    rng = np.random.default_rng(66)
    T, M, d, k = T_TILE, 2 * CHUNK, 48, 30
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    idx, vals = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k + PRESELECT_MARGIN,
        interpret=True, select="packed3")
    idx = np.asarray(idx)
    ref_idx, _ = oracle.preselect(targets, db, k)
    covered = np.mean([
        len(np.intersect1d(idx[t], ref_idx[t])) / k for t in range(T)])
    assert covered == 1.0, f"exact top-{k} coverage {covered:.5f}"
    # pileup: a run of near-duplicates longer than the 3 precomputed
    # levels inside one block -> overflow -> stream fallback, exact result
    base = rng.standard_normal(d).astype(np.float32)
    for i in range(10):
        db[512 + i] = base + 1e-3 * i
    targets[:16] = base + 1e-4
    i_s, _ = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=8, interpret=True,
        select="stream")
    i_p, _ = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=8, interpret=True,
        select="packed3")
    np.testing.assert_array_equal(np.sort(np.asarray(i_p)[:16]),
                                  np.sort(np.asarray(i_s)[:16]))


def test_pallas_packed3_grid_order_invariant():
    rng = np.random.default_rng(67)
    T, M, d, k = 2 * T_TILE, 2 * CHUNK, 24, 10
    targets = jnp.asarray(rng.standard_normal((T, d)).astype(np.float32))
    db = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))
    i1, v1 = pallas_topk_preselect(targets, db, k=k, interpret=True,
                                   select="packed3", db_major=True)
    i2, v2 = pallas_topk_preselect(targets, db, k=k, interpret=True,
                                   select="packed3", db_major=False)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_pallas_packed3_partition_starved():
    """Partition masks ride the int key domain in packed3 too: starved
    rows keep inf sentinels and never trigger a bogus overflow rerun."""
    rng = np.random.default_rng(68)
    T, M, d, k = T_TILE, 2 * CHUNK, 32, 12
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    tgt_part = rng.integers(0, 3, T).astype(np.int32)
    db_part = rng.integers(0, 3, M).astype(np.int32)
    tgt_part[:4] = 9
    db_part[:3] = 9
    part = (jnp.asarray(tgt_part), jnp.asarray(db_part))
    i_p, v_p = pallas_topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, interpret=True,
        partition=part, select="packed3")
    i_p, v_p = np.asarray(i_p), np.asarray(v_p)
    finite = np.isfinite(v_p)
    assert np.isinf(v_p[:4][:, 3:]).all() or (np.isfinite(v_p[:4]).sum(1) <= 3).all()
    assert (db_part[i_p[finite]] == np.broadcast_to(
        tgt_part[:, None], i_p.shape)[finite]).all()
