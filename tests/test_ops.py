"""Kernel-level agreement tests: TPU-path ops vs the float64 numpy oracle."""

import numpy as np
import jax.numpy as jnp

from snickery_tpu import oracle
from snickery_tpu.ops.topk import topk_preselect
from snickery_tpu.ops.viterbi import viterbi_decode, greedy_decode
from snickery_tpu.ops.ola import overlap_add_units


def test_topk_matches_oracle(rng):
    T, M, d, k = 37, 2048, 24, 10
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    idx, scores = topk_preselect(jnp.asarray(targets), jnp.asarray(db), k=k, chunk=512)
    ref_idx, ref_sq = oracle.preselect(targets, db, k)
    agree = (np.asarray(idx) == ref_idx).mean()
    assert agree == 1.0, f"top-k index agreement {agree}"
    # scores omit ||t||^2; adding it back recovers true squared distances
    true_sq = np.asarray(scores) + (targets ** 2).sum(-1, keepdims=True)
    np.testing.assert_allclose(true_sq, ref_sq, rtol=1e-3, atol=1e-3)


def test_oracle_fast_preselect_matches_loop(rng):
    """The GEMM-identity f64 oracle variant (used by bench at 1M-unit scale)
    selects identically to the loop-level oracle."""
    targets = rng.standard_normal((40, 24)).astype(np.float32)
    db = rng.standard_normal((3000, 24)).astype(np.float32)
    i1, s1 = oracle.preselect(targets, db, 12)
    i2, s2 = oracle.preselect_fast(targets, db, 12)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-9, atol=1e-9)
    extra = np.where(rng.random((40, 3000)) < 0.5, 1e10, 0.0)
    i1, _ = oracle.preselect(targets, db, 12, extra=extra)
    i2, _ = oracle.preselect_fast(targets, db, 12, extra=extra)
    np.testing.assert_array_equal(i1, i2)


def test_viterbi_matches_oracle(rng):
    T, N, dj = 50, 16, 8
    tc = rng.random((T, N)).astype(np.float32) * 5
    jl = rng.standard_normal((T, N, dj)).astype(np.float32)
    jr = rng.standard_normal((T, N, dj)).astype(np.float32)
    path, cost = viterbi_decode(jnp.asarray(tc), jnp.asarray(jl), jnp.asarray(jr),
                                join_cost_weight=0.7)
    ref_path, ref_cost = oracle.viterbi(tc, jl, jr, join_cost_weight=0.7)
    agree = (np.asarray(path) == ref_path).mean()
    assert agree >= 0.99, f"viterbi agreement {agree}"
    assert abs(float(cost) - ref_cost) / ref_cost < 1e-4


def test_viterbi_epsilon_pruning_consistent(rng):
    # with a huge epsilon, pruning must change nothing
    T, N, dj = 30, 12, 6
    tc = rng.random((T, N)).astype(np.float32)
    jl = rng.standard_normal((T, N, dj)).astype(np.float32)
    jr = rng.standard_normal((T, N, dj)).astype(np.float32)
    p0, c0 = viterbi_decode(jnp.asarray(tc), jnp.asarray(jl), jnp.asarray(jr))
    p1, c1 = viterbi_decode(jnp.asarray(tc), jnp.asarray(jl), jnp.asarray(jr),
                            search_epsilon=1e9)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    assert abs(float(c0) - float(c1)) < 1e-5


def test_viterbi_padding_invariance(rng):
    T, N, dj, pad = 20, 8, 4, 12
    tc = rng.random((T, N)).astype(np.float32)
    jl = rng.standard_normal((T, N, dj)).astype(np.float32)
    jr = rng.standard_normal((T, N, dj)).astype(np.float32)
    p0, c0 = viterbi_decode(jnp.asarray(tc), jnp.asarray(jl), jnp.asarray(jr))
    tc_p = np.pad(tc, ((0, pad), (0, 0)), constant_values=123.0)  # junk in padding
    jl_p = np.pad(jl, ((0, pad), (0, 0), (0, 0)), constant_values=9.0)
    jr_p = np.pad(jr, ((0, pad), (0, 0), (0, 0)), constant_values=-7.0)
    p1, c1 = viterbi_decode(jnp.asarray(tc_p), jnp.asarray(jl_p), jnp.asarray(jr_p),
                            length=T)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1)[:T])
    assert abs(float(c0) - float(c1)) < 1e-4


def test_greedy_matches_oracle(rng):
    T, N, dj = 40, 10, 5
    tc = rng.random((T, N)).astype(np.float32) * 3
    jl = rng.standard_normal((T, N, dj)).astype(np.float32)
    jr = rng.standard_normal((T, N, dj)).astype(np.float32)
    path, cost = greedy_decode(jnp.asarray(tc), jnp.asarray(jl), jnp.asarray(jr),
                               join_cost_weight=0.5)
    ref_path, ref_cost = oracle.greedy(tc, jl, jr, join_cost_weight=0.5)
    assert (np.asarray(path) == ref_path).all()
    assert abs(float(cost) - ref_cost) / max(ref_cost, 1e-9) < 1e-4


def test_ola_matches_oracle_and_reconstructs(rng):
    # corpus = smooth signal; natural consecutive units must reconstruct it
    n = 6000
    corpus = np.sin(np.arange(n) / 40.0).astype(np.float32)
    taper = 32
    # 10 consecutive units of 400 samples starting at 500
    starts = 500 + 400 * np.arange(10)
    ends = starts + 400
    out, total = overlap_add_units(
        jnp.asarray(corpus), jnp.asarray(starts), jnp.asarray(ends),
        n_units=jnp.int32(10), max_frag=512, out_len=8192, taper=taper)
    out = np.asarray(out)
    total = int(total)
    assert total == 4000 + 2 * taper
    ref = oracle.overlap_add(corpus, starts, ends, taper)
    np.testing.assert_allclose(out[:total], ref, atol=1e-5)
    # interior must equal the corpus exactly (perfect natural reconstruction)
    np.testing.assert_allclose(
        out[2 * taper: total - 2 * taper],
        corpus[500 + taper: 500 + 4000 - taper],
        atol=1e-5,
    )


def test_ola_corpus_boundary_clipping(rng):
    """Units whose taper window crosses the corpus start/end must match the
    zero-filled oracle exactly (the row-granular path zeroes whole out-of-
    range 128-sample rows; in-range samples are untouched)."""
    corpus = rng.standard_normal(2000).astype(np.float32)
    taper = 64
    # first unit starts at sample 10 (taper window reaches -54);
    # last unit ends at 1990 (window reaches 2054)
    starts = np.array([10, 500, 1590])
    ends = np.array([500, 1590, 1990])
    out, total = overlap_add_units(
        jnp.asarray(corpus), jnp.asarray(starts), jnp.asarray(ends),
        n_units=jnp.int32(3), max_frag=2176, out_len=2560, taper=taper)
    ref = oracle.overlap_add(corpus, starts, ends, taper)
    np.testing.assert_allclose(np.asarray(out)[: int(total)], ref, atol=1e-5)


def test_ola_padded_units_ignored(rng):
    corpus = rng.standard_normal(4000).astype(np.float32)
    starts = np.array([100, 600, 0, 0])
    ends = np.array([500, 1000, 0, 0])
    out, total = overlap_add_units(
        jnp.asarray(corpus), jnp.asarray(starts), jnp.asarray(ends),
        n_units=jnp.int32(2), max_frag=1024, out_len=2048, taper=16)
    out2, total2 = overlap_add_units(
        jnp.asarray(corpus), jnp.asarray(starts[:2]), jnp.asarray(ends[:2]),
        n_units=jnp.int32(2), max_frag=1024, out_len=2048, taper=16)
    assert int(total) == int(total2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_topk_fused_linguistic_matches_dense(rng):
    import jax.numpy as jnp
    from snickery_tpu.ops.topk import quinphone_penalties

    T, M, d, k = 16, 1024, 12, 8
    targets = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    tgt_codes = rng.integers(0, 5, T).astype(np.int32)
    tgt_ctx = rng.integers(0, 4, (T, 5)).astype(np.int32)
    db_codes = rng.integers(0, 5, M).astype(np.int32)
    db_ctx = rng.integers(0, 4, (M, 5)).astype(np.int32)

    dense = quinphone_penalties(
        jnp.asarray(tgt_codes), jnp.asarray(tgt_ctx),
        jnp.asarray(db_codes), jnp.asarray(db_ctx))
    idx_d, sc_d = topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, chunk=256,
        extra_scores=dense)
    idx_f, sc_f = topk_preselect(
        jnp.asarray(targets), jnp.asarray(db), k=k, chunk=256,
        linguistic=(jnp.asarray(tgt_codes), jnp.asarray(tgt_ctx),
                    jnp.asarray(db_codes), jnp.asarray(db_ctx)))
    np.testing.assert_array_equal(np.asarray(idx_d), np.asarray(idx_f))
    np.testing.assert_allclose(np.asarray(sc_d), np.asarray(sc_f), rtol=1e-5)


def test_fallback_partition_starved_rows_are_inf():
    """XLA-fallback preselect masks partition mismatches with inf (like the
    Pallas kernel) so rescoring identifies excluded slots via isinf; the
    hierarchical top-k must RESTORE inf on output (it clamps internally to
    a finite sentinel because 0 * inf = NaN in its one-hot MXU extraction)."""
    import jax.numpy as jnp
    from snickery_tpu.ops.topk import topk_preselect

    rng = np.random.default_rng(40)
    T, M, d, k = 8, 512, 16, 6
    tgt = rng.standard_normal((T, d)).astype(np.float32)
    db = rng.standard_normal((M, d)).astype(np.float32)
    dp = np.zeros(M, np.int32)
    dp[:3] = 2                       # only 3 units of partition 2
    tp = np.full(T, 2, np.int32)
    idx, vals = topk_preselect(
        jnp.asarray(tgt), jnp.asarray(db), k=k, chunk=256,
        partition=(jnp.asarray(tp), jnp.asarray(dp)))
    vals = np.asarray(vals)
    finite = np.isfinite(vals)
    assert (finite.sum(axis=1) == 3).all(), "3 finite slots expected per row"
    assert np.isinf(vals[~finite]).all(), "excluded slots must be inf, not a sentinel"
    assert (np.asarray(idx)[:, :3] < 3).all(), "finite winners must be partition members"


def test_pallas_tiling_invariance():
    """The kernel's sorted output must be IDENTICAL across internal tilings
    (t_tile, chunk, block) and selection modes — the canonical (value, col)
    ordering guarantees downstream Viterbi tie-breaking can't depend on
    kernel internals."""
    import jax.numpy as jnp
    from snickery_tpu.ops.pallas_topk import pallas_topk_preselect

    rng = np.random.default_rng(41)
    T, M, d, k = 512, 4096, 24, 10
    tgt = jnp.asarray(rng.standard_normal((T, d)).astype(np.float32))
    db = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))
    ref = None
    for (tt, ch, bl, sel) in [(256, 2048, 128, "stream"),
                              (256, 1024, 64, "stream"),
                              (512, 4096, 256, "stream"),
                              (256, 2048, 128, "phase")]:
        idx, vals = pallas_topk_preselect(
            tgt, db, k=k, interpret=True, mm_precision="highest",
            t_tile=tt, chunk=ch, block=bl, select=sel, sort=True)
        got = (np.asarray(idx), np.asarray(vals))
        if ref is None:
            ref = got
        else:
            np.testing.assert_array_equal(got[0], ref[0])
            np.testing.assert_array_equal(got[1], ref[1])


def test_host_ola_matches_device(rng):
    """host_overlap_add (preload_all_waves=False path) is sample-equivalent
    to the device kernel, including corpus-boundary clipping."""
    from snickery_tpu.ops.ola import host_overlap_add

    n = 5000
    corpus = rng.standard_normal(n).astype(np.float32)
    taper = 24
    starts = np.asarray([10, 900, 3777, 4801, 450])   # edges + interior
    ends = starts + np.asarray([300, 411, 129, 190, 333])
    out, total = overlap_add_units(
        jnp.asarray(corpus), jnp.asarray(starts), jnp.asarray(ends),
        n_units=jnp.int32(len(starts)), max_frag=512, out_len=4096,
        taper=taper)
    host = host_overlap_add(corpus, starts, ends, taper)
    total = int(total)
    assert len(host) == total
    np.testing.assert_allclose(np.asarray(out)[:total], host, atol=1e-5)


def test_order_topk_positions_matches_lexsort(rng):
    """The k-argmin ordering sweep must reproduce lexsort's (value, id)
    ascending positions exactly, including inf (partition-starved) slots
    as long as any finite entries remain."""
    from snickery_tpu.ops.topk import order_topk_positions

    T, n, k = 64, 40, 30
    vals = rng.standard_normal((T, n)).astype(np.float32)
    vals[vals > 1.2] = np.inf                  # some starved slots
    vals[7] = np.tile(vals[7, :8], 5)          # heavy value ties
    ids = np.argsort(rng.standard_normal((T, n)), axis=-1).astype(np.int32)
    ref = np.asarray(jnp.lexsort((jnp.asarray(ids), jnp.asarray(vals)),
                                 axis=-1))[:, :k]
    got = np.asarray(order_topk_positions(jnp.asarray(vals),
                                          jnp.asarray(ids), k))
    # rows with >= k finite-or-unextracted entries must match exactly;
    # compare via the (val, id) pairs they select (positions can differ
    # only between identical pairs, which cannot exist here: ids unique)
    np.testing.assert_array_equal(
        np.take_along_axis(vals, ref, 1), np.take_along_axis(vals, got, 1))
    finite = np.isfinite(np.take_along_axis(vals, ref, 1))
    np.testing.assert_array_equal(
        np.take_along_axis(ids, ref, 1)[finite],
        np.take_along_axis(ids, got, 1)[finite])


def test_chunked_device_put_matches_plain(rng):
    from snickery_tpu import utils

    # tiny chunk_bytes forces the multi-part path; values must round-trip
    # bit-exactly and concatenate back to the full array
    a = rng.standard_normal((1000, 7)).astype(np.float32)
    x = utils.chunked_device_put(a, chunk_bytes=7 * 4 * 100)
    np.testing.assert_array_equal(np.asarray(x), a)
    w = rng.integers(-32768, 32767, size=10_001).astype(np.int16)
    y = utils.chunked_device_put(w, chunk_bytes=1024)
    np.testing.assert_array_equal(np.asarray(y), w)
    # small arrays and scalars take the plain path
    s = utils.chunked_device_put(np.float32(2.5))
    assert float(np.asarray(s)) == 2.5


def test_inplace_device_put_matches_plain(rng, monkeypatch):
    """Arrays above _INPLACE_UPLOAD_BYTES fill a donated device buffer in
    place (peak ~N HBM, not ~2N); values must still round-trip bit-exactly,
    including ragged final chunks and lookahead > n_chunks."""
    import jax

    from snickery_tpu import utils

    monkeypatch.setattr(utils, "_INPLACE_UPLOAD_BYTES", 1024)
    dev = jax.devices()[0]
    for shape, dtype in [((999, 13), np.float32), ((4097,), np.int16),
                         ((300, 5), np.int32)]:
        a = (rng.standard_normal(shape) * 100).astype(dtype)
        x = utils.chunked_device_put(a, chunk_bytes=2048)
        assert x.dtype == a.dtype and x.shape == a.shape
        np.testing.assert_array_equal(np.asarray(x), a)
    # two rows, chunk smaller than one row: step clamps to 1 row
    b = rng.standard_normal((3, 2000)).astype(np.float32)
    y = utils._inplace_device_put(b, dev, step=1)
    np.testing.assert_array_equal(np.asarray(y), b)
