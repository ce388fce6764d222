"""voicedb.device_layout: the raw-block builder must reconstruct join
contexts exactly, for any shard count, and the Synthesiser's mesh_db > 1
bridge must agree with the single-device pipeline."""

import numpy as np
import pytest

from snickery_tpu.voicedb.device_layout import build_raw_blocks


def _emulate_device_gather(blocks, q, m_s, ndb, kd, dj, unit_ids):
    """Numpy replica of the device jr gather: block[ptr > 0 ? ptr : idx+1]."""
    out_jl = np.zeros((len(unit_ids), dj), np.float32)
    out_jr = np.zeros((len(unit_ids), dj), np.float32)
    for i, u in enumerate(unit_ids):
        s, local = u // m_s, u % m_s
        block = blocks[s * q:(s + 1) * q]
        row = block[local]
        out_jl[i] = row[:dj]
        # pointer column carries int32 BITS in the f32 array
        ptr = int(np.asarray(row[kd], np.float32).view(np.int32))
        g = ptr if ptr > 0 else local + 1
        out_jr[i] = block[g][:dj]
    return out_jl, out_jr


@pytest.mark.parametrize("ndb", [1, 2, 4])
def test_blocks_reconstruct_joins_exactly(ndb):
    rng = np.random.default_rng(0)
    m, kd, dj = 37, 6, 4
    mp = 40  # padded, divisible by every ndb tested
    feats = rng.standard_normal((m, kd)).astype(np.float32)
    # builder-style jr: next unit's first frame, with irregular rows at
    # "utterance boundaries" and the final unit
    jr = np.zeros((m, dj), np.float32)
    jr[:-1] = feats[1:, :dj]
    for b in (9, 10, 23, m - 1):   # includes two ADJACENT boundaries
        jr[b] = rng.standard_normal(dj).astype(np.float32)

    blocks, q, m_s = build_raw_blocks(feats, jr, mp, ndb=ndb)
    assert blocks.shape == (ndb * q, kd + 1)
    assert m_s == mp // ndb

    ids = np.arange(m)
    jl_got, jr_got = _emulate_device_gather(blocks, q, m_s, ndb, kd, dj, ids)
    np.testing.assert_array_equal(jl_got, feats[:, :dj])
    np.testing.assert_array_equal(jr_got, jr)


def test_blocks_all_rows_exceptional():
    """Fully irregular jr (e.g. synthetic test voices) still reconstructs."""
    rng = np.random.default_rng(1)
    m = kd = dj = 8
    feats = rng.standard_normal((m, kd)).astype(np.float32)
    jr = rng.standard_normal((m, dj)).astype(np.float32)
    blocks, q, m_s = build_raw_blocks(feats, jr, m, ndb=2)
    jl_got, jr_got = _emulate_device_gather(
        blocks, q, m_s, 2, kd, dj, np.arange(m))
    np.testing.assert_array_equal(jl_got, feats)
    np.testing.assert_array_equal(jr_got, jr)


def test_foreign_db_invariant_guard():
    """A DB whose join_left does not equal the units' own first raw frame
    (impossible for builder output, possible for a hand-made DB) must be
    rejected at load, not silently decoded with wrong join contexts."""
    import dataclasses

    from snickery_tpu.synth import Synthesiser
    from tests.toyvoice import build_toy_voice

    cfg, db, _ = build_toy_voice(halfphone=False, multiepoch=1)
    bad = dataclasses.replace(db, join_left=db.join_left + 1.0)
    with pytest.raises(ValueError, match="join_left"):
        Synthesiser(cfg, db=bad)


def test_synthesiser_mesh_db2_bridge_matches_single():
    """cfg.mesh_db = 2 through the PUBLIC synth_batch API: the host-side
    per-shard block rebuild must reproduce the 1x1
    decode exactly (same toy utterances, natural targets)."""
    import dataclasses

    from snickery_tpu.synth import Synthesiser
    from tests.toyvoice import build_toy_voice

    cfg, db, utts = build_toy_voice(halfphone=False, multiepoch=1)
    ref = Synthesiser(cfg, db=db)
    singles = [ref.synth_from_features(u.features) for u in utts[:4]]

    cfg2 = dataclasses.replace(cfg, mesh_data=2, mesh_db=2)
    synth2 = Synthesiser(cfg2, db=db)
    results = synth2.synth_batch([u.features for u in utts[:4]])

    assert synth2._mesh is not None and synth2._mesh.shape["db"] == 2
    for r, s in zip(results, singles):
        np.testing.assert_array_equal(r["unit_ids"], s["unit_ids"])
        np.testing.assert_allclose(r["wave"], s["wave"], atol=1e-4)
