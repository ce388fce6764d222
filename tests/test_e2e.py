"""End-to-end synthesis tests on a toy voice (epoch + halfphone modes),
including the unit-sequence agreement harness vs the float64 oracle
(BASELINE.json: >=99% agreement criterion)."""

import numpy as np
import pytest

from snickery_tpu import oracle
from snickery_tpu.synth import Synthesiser
from tests.toyvoice import build_toy_voice, prepare_toy_utts


@pytest.fixture(scope="module")
def epoch_voice():
    cfg, db, utts = build_toy_voice(halfphone=False, multiepoch=1)
    return cfg, db, utts, Synthesiser(cfg, db=db)


@pytest.fixture(scope="module")
def halfphone_voice():
    cfg, db, utts = build_toy_voice(halfphone=True)
    return cfg, db, utts, Synthesiser(cfg, db=db)


def _epoch_targets(synth, utt):
    return synth.targets_from_features(utt.features)


def test_epoch_synth_resynthesises_training_utterance(epoch_voice):
    cfg, db, utts, synth = epoch_voice
    utt = utts[0]
    result = synth.synth_from_features(utt.features)
    assert result["n_units"] > 50
    # natural target -> overwhelmingly natural unit sequence (cost ~0 path)
    ids = result["unit_ids"]
    utt_of_unit = db.utt_index[ids]
    assert (utt_of_unit == 0).mean() > 0.9
    # selected units should be consecutive runs
    pos = db.unit_pos[ids]
    natural_steps = (np.diff(pos) == 1).mean()
    assert natural_steps > 0.85, f"natural continuation rate {natural_steps}"
    # audio close to the original in the interior.  Output sample j maps to
    # corpus sample (first unit's anchor - taper + j) when the path is natural.
    wave = result["wave"]
    t = cfg.taper_length
    anchor0 = int(db.cutpoints[ids[0], 1])     # corpus coords (utt0 offset = 0)
    lo, hi = 2 * t, len(wave) - 2 * t
    src = np.arange(lo, hi) + anchor0 - t
    keep = src < len(utt.wave)
    a = utt.wave[src[keep]]
    b = wave[lo:hi][keep]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.8, f"resynthesis corr {corr}"


def test_epoch_agreement_vs_oracle(epoch_voice):
    """TRULY held-out target: the DB is built from utts seeded 100..103;
    the target trajectory comes from a freshly generated utterance (seed
    900) whose natural units are NOT in the DB, so agreement cannot ride
    the zero-cost natural path (VERDICT.md round 1, weak #3)."""
    from tests.toyvoice import prepare_toy_utts
    cfg, db, utts, synth = epoch_voice
    utt = prepare_toy_utts(1, seed0=900)[0]
    result = synth.synth_from_features(utt.features)
    ids_tpu = result["unit_ids"]

    # oracle pipeline on the same normalised/weighted arrays
    tgt_units, t_units = synth.targets_from_features(utt.features)
    tnorm = (tgt_units - db.mean_target) / db.std_target
    tw = (tnorm * synth._sqrt_wt[None, :]).astype(np.float32)
    feats = db.normalised_features().astype(np.float32) * synth._sqrt_wt[None, :]
    jl, jr = db.normalised_joins()
    jl = (jl * synth._sqrt_wj[None, :]).astype(np.float32)
    jr = (jr * synth._sqrt_wj[None, :]).astype(np.float32)
    ids_ref, _ = oracle.synth_pipeline(
        tw, feats, jl, jr,
        n_candidates=min(cfg.n_candidates, synth.n_units_padded),
        join_cost_weight=cfg.join_cost_weight,
    )
    agree = (ids_tpu == ids_ref).mean()
    assert agree >= 0.99, f"unit-sequence agreement vs oracle: {agree}"


def test_epoch_greedy_runs(epoch_voice):
    cfg, db, utts, synth = epoch_voice
    result = synth.synth_from_features(utts[1].features, greedy=True)
    assert result["n_units"] > 50
    assert np.isfinite(result["total_cost"])
    assert len(result["wave"]) > 1000


def test_magphase_resynthesis_path(epoch_voice):
    cfg, db, utts, synth = epoch_voice
    utt = utts[0]
    result = synth.synth_from_features(utt.features)
    wave = synth.resynth_magphase(result["unit_ids"])
    assert len(wave) > 1000
    assert np.isfinite(wave).all()
    # target f0 imposition path
    tgt_lf0 = utt.lf0[: result["n_units"] * synth.frames_per_unit]
    wave2 = synth.resynth_magphase(result["unit_ids"], target_lf0=tgt_lf0)
    assert len(wave2) > 1000


def test_halfphone_synth(halfphone_voice):
    cfg, db, utts, synth = halfphone_voice
    assert db.target_representation == "halfphone"
    assert len(db.unit_names) > 4
    utt = utts[0]
    tgt, kept = synth.halfphone_targets_from_features(utt.features, utt.epochs, utt.halfphones)
    assert len(kept) > 8
    result = synth.synth_from_features(tgt, target_segments=kept)
    ids = result["unit_ids"]
    # selected units must match the requested halfphone identity
    want = np.asarray([synth._unit_vocab[s.name] for s in kept])
    got = db.unit_code[ids]
    match = (want == got).mean()
    assert match > 0.95, f"halfphone identity match {match}"
    assert len(result["wave"]) > 1000


def test_halfphone_synth_batch_matches_single(halfphone_voice):
    """Batched halfphone synthesis (sharded path with fused quinphone
    penalties) selects the same units as the single-utterance pipeline."""
    cfg, db, utts, synth = halfphone_voice
    feats_list, segs_list = [], []
    for utt in utts[:3]:
        tgt, kept = synth.halfphone_targets_from_features(
            utt.features, utt.epochs, utt.halfphones)
        feats_list.append(tgt)
        segs_list.append(kept)
    batch = synth.synth_batch(feats_list, segments_list=segs_list)
    assert len(batch) == 3
    for f, s, res in zip(feats_list, segs_list, batch):
        single = synth.synth_from_features(f, target_segments=s)
        agree = (res["unit_ids"] == single["unit_ids"]).mean()
        assert agree >= 0.99, f"halfphone batch-vs-single agreement {agree}"
        assert res["n_units"] == single["n_units"]
        assert len(res["wave"]) > 500


def test_multiepoch_voice():
    cfg, db, utts = build_toy_voice(halfphone=False, multiepoch=4, n_utts=2)
    synth = Synthesiser(cfg, db=db)
    utt = utts[0]
    result = synth.synth_from_features(utt.features)
    assert result["n_units"] > 10
    # each unit spans ~4 epochs: DB target dim must be 4*d
    assert db.target_dim == 4 * cfg.target_dim
    assert len(result["wave"]) > 1000


def test_voicedb_save_load_roundtrip(tmp_path, epoch_voice):
    cfg, db, utts, synth = epoch_voice
    p = str(tmp_path / "voice.voicedb")
    db.save(p)
    from snickery_tpu.voicedb.db import VoiceDB
    db2 = VoiceDB.load(p)
    assert db2.n_units == db.n_units
    np.testing.assert_array_equal(db2.unit_features, db.unit_features)
    np.testing.assert_array_equal(db2.cutpoints, db.cutpoints)
    assert db2.filenames == db.filenames
    # a Synthesiser built from the loaded DB selects identically
    synth2 = Synthesiser(cfg, db=db2)
    utt = utts[0]
    r1 = synth.synth_from_features(utt.features)
    r2 = synth2.synth_from_features(utt.features)
    np.testing.assert_array_equal(r1["unit_ids"], r2["unit_ids"])


def test_synth_batch_matches_single(epoch_voice):
    cfg, db, utts, synth = epoch_voice
    feats = [utts[0].features, utts[1].features, utts[2].features]
    batch = synth.synth_batch(feats)
    assert len(batch) == 3
    for f, res in zip(feats, batch):
        single = synth.synth_from_features(f)
        agree = (res["unit_ids"] == single["unit_ids"]).mean()
        assert agree >= 0.99, f"batch-vs-single agreement {agree}"
        assert res["n_units"] == single["n_units"]


def test_join_smoothing_resynthesis(epoch_voice):
    cfg, db, utts, synth = epoch_voice
    utt = utts[0]
    result = synth.synth_from_features(utt.features)
    plain = synth.resynth_magphase(result["unit_ids"])
    synth.cfg.magphase_smooth_joins = 2
    try:
        smoothed = synth.resynth_magphase(result["unit_ids"])
    finally:
        synth.cfg.magphase_smooth_joins = 0
    # smoothing perturbs lf0 slightly -> epoch grid (and total length) shifts
    assert abs(len(smoothed) - len(plain)) < 0.05 * len(plain) + 1000
    assert np.isfinite(smoothed).all()


def test_smooth_joins_preserves_interiors(rng):
    import jax.numpy as jnp
    from snickery_tpu.features import smooth_joins
    k, width = 8, 2
    traj = rng.standard_normal((5 * k, 6)).astype(np.float32)
    out = np.asarray(smooth_joins(jnp.asarray(traj), k, width=width))
    # frames far from any join are untouched
    far = np.ones(len(traj), bool)
    for j in range(k, len(traj), k):
        far[j - width: j + width] = False
    np.testing.assert_allclose(out[far], traj[far], atol=1e-6)
    # near-join frames move
    assert np.abs(out[~far] - traj[~far]).max() > 0


def test_streaming_matches_greedy(epoch_voice):
    cfg, db, utts, synth = epoch_voice
    utt = utts[1]
    # streaming in 3 chunks vs one-shot greedy decode
    feats = utt.features[1:-1]          # align with targets_from_features grid
    n = len(feats)
    chunks = [feats[: n // 3], feats[n // 3: 2 * n // 3], feats[2 * n // 3:]]
    stream_audio = np.concatenate(list(synth.synth_streaming(iter(chunks))))
    ref = synth.synth_from_features(utt.features, greedy=True)
    # same number of decoded units and near-identical audio
    assert abs(len(stream_audio) - len(ref["wave"])) <= 2 * cfg.taper_length
    m = min(len(stream_audio), len(ref["wave"]))
    corr = np.corrcoef(stream_audio[:m], ref["wave"][:m])[0, 1]
    assert corr > 0.98, f"streaming-vs-greedy corr {corr}"


def test_streaming_flushes_leftover_multiepoch():
    cfg, db, utts = build_toy_voice(halfphone=False, multiepoch=4, n_utts=2)
    synth = Synthesiser(cfg, db=db)
    utt = utts[0]
    feats = utt.features[1:-1]
    # chunk sizes chosen so a non-multiple-of-4 tail remains at end of stream
    n = (len(feats) // 4) * 4 + 2 if len(feats) % 4 != 2 else len(feats)
    feats = feats[:n] if n <= len(feats) else feats
    chunks = [feats[: len(feats) // 2], feats[len(feats) // 2:]]
    audio = np.concatenate(list(synth.synth_streaming(iter(chunks))))
    # all units decoded: total units = ceil(len/4)
    expect_units = -(-len(feats) // 4)
    # audio length ≈ units * ~4 epochs * period; just check the tail isn't dropped
    assert len(audio) > (expect_units - 1) * 4 * 100


def test_sample_level_units(tmp_path):
    """target_representation='sample': fixed-hop units, no pitchmarks."""
    import json
    from snickery_tpu.cli import main as cli_main
    from snickery_tpu.io.speech import read_wave, write_wave
    from tests.toyvoice import SR, synth_utterance

    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    for i in range(2):
        wave, _ = synth_utterance(500 + i, n_segments=4)
        write_wave(wave, str(wav_dir / f"s{i}.wav"), SR)
    cfg = {
        "workdir": str(tmp_path / "work"),
        "wav_datadir": str(wav_dir),
        "target_representation": "sample",
        "sample_hop": 96,
        "multiepoch": 2,
        "stream_list": ["mag", "real", "imag", "lf0"],
        "datadims": {"mag": 60, "real": 45, "imag": 45, "lf0": 1},
        "sample_rate": SR,
        "n_candidates": 8,
        "taper_length": 32,
        "length_buckets": [64, 128],
        "voice_name": "sampletoy",
    }
    cfg_path = tmp_path / "s.json"
    cfg_path.write_text(json.dumps(cfg))
    assert cli_main(["train", "-c", str(cfg_path)]) == 0
    from snickery_tpu.voicedb.db import VoiceDB
    db = VoiceDB.load(str(tmp_path / "work" / "sampletoy.voicedb"))
    assert db.target_representation == "sample"
    # uniform grid: all unit spans are exactly multiepoch * hop
    spans = db.cutpoints[:, 2] - db.cutpoints[:, 1]
    assert (spans == 2 * 96).all()
    out = tmp_path / "out"
    assert cli_main(["synth", "-c", str(cfg_path), "-o", str(out), "s0"]) == 0
    audio, sr = read_wave(str(out / "s0.wav"))
    assert len(audio) > 1000 and np.abs(audio).max() > 0.01


def test_epoch_agreement_vs_oracle_split3cat(epoch_voice):
    """Same held-out-target agreement gate through the bf16-split ranking
    path (preselect_precision=split3cat): the exact-f32 candidate rescoring
    + PRESELECT_MARGIN must keep unit sequences oracle-faithful even though
    the kernel ranks with ~1e-3-error matmuls.

    use_pallas="interpret" forces the REAL Pallas kernel (interpret mode)
    on the CPU test backend — without it _use_pallas() is False on CPU and
    this test would silently exercise only the exact XLA fallback."""
    from tests.toyvoice import prepare_toy_utts
    cfg, db, utts, synth = epoch_voice
    utt = prepare_toy_utts(1, seed0=901)[0]
    old = (cfg.preselect_precision, cfg.use_pallas)
    cfg.preselect_precision = "split3cat"
    cfg.use_pallas = "interpret"
    try:
        result = synth.synth_from_features(utt.features)
    finally:
        cfg.preselect_precision, cfg.use_pallas = old
    ids_tpu = result["unit_ids"]

    tgt_units, t_units = synth.targets_from_features(utt.features)
    tnorm = (tgt_units - db.mean_target) / db.std_target
    tw = (tnorm * synth._sqrt_wt[None, :]).astype(np.float32)
    feats = db.normalised_features().astype(np.float32) * synth._sqrt_wt[None, :]
    jl, jr = db.normalised_joins()
    jl = (jl * synth._sqrt_wj[None, :]).astype(np.float32)
    jr = (jr * synth._sqrt_wj[None, :]).astype(np.float32)
    ids_ref, _ = oracle.synth_pipeline(
        tw, feats, jl, jr,
        n_candidates=min(cfg.n_candidates, synth.n_units_padded),
        join_cost_weight=cfg.join_cost_weight,
    )
    agree = (ids_tpu == ids_ref).mean()
    assert agree >= 0.99, f"split3cat agreement vs oracle: {agree}"


def test_streaming_hybrid_fixed_rate_matches_batch_conversion(epoch_voice):
    """Config #4 as specified: fixed-rate DNN-style chunks stream in, the
    epoch grid integrates incrementally, and the decode matches feeding the
    one-shot batch conversion through the same epoch-rate streaming path."""
    from snickery_tpu.features.world import (
        fixed_to_epoch_targets, resample_to_fixed)
    from tests.toyvoice import prepare_toy_utts

    cfg, db, utts, synth = epoch_voice
    utt = prepare_toy_utts(1, seed0=905)[0]
    fs = 0.005
    # natural epoch-rate features -> fixed-rate "DNN output" stand-in
    fixed = resample_to_fixed(utt.features, utt.epochs, cfg.sample_rate, fs)
    lf0_col = [a for (n, a, b) in cfg.stream_slices if n == "lf0"][0]

    chunks = [fixed[i:i + 40] for i in range(0, len(fixed), 40)]
    audio_stream = list(synth.synth_streaming(
        iter(chunks), fixed_frameshift=fs))
    ids_stream = np.concatenate(synth.last_stream_unit_ids)

    ep_feats, _ = fixed_to_epoch_targets(fixed, lf0_col, cfg.sample_rate, fs)
    ep_chunks = [ep_feats[i:i + 32] for i in range(0, len(ep_feats), 32)]
    audio_ref = list(synth.synth_streaming(iter(ep_chunks)))
    ids_ref = np.concatenate(synth.last_stream_unit_ids)

    np.testing.assert_array_equal(ids_stream, ids_ref)
    wave_a = np.concatenate(audio_stream)
    wave_b = np.concatenate(audio_ref)
    assert len(wave_a) == len(wave_b)
    np.testing.assert_allclose(wave_a, wave_b, atol=1e-4)


def test_halfphone_fallback_keeps_f32_precision():
    """Identity rule: lattice MASK + order-preserving ranking penalty.

    Two lattice steps on a hand-built 256-unit halfphone DB (only units
    8 and 9 carry the step-0 name; nothing carries the step-1 name):
    - step 0: the same-name pool (2 units) is smaller than n_cand, so
      mismatched units fill the remaining slots — one of them acoustically
      closer than every same-name unit.  It must still lose (lattice mask).
    - step 1: NO same-name unit exists anywhere (pool exhausted): the
      acoustically best fallback must win.  Its id (5) is ABOVE the ids of
      four slightly-worse fallbacks (0..3), and all five squared distances
      lie within one f32 ulp of BIG_PENALTY (1e10 -> 1024): ranking with
      sq + 1e10 absorbs the acoustic order, id-orders the pool, drops unit
      5, and picks unit 0 — the round-3 bench regression (halfphone oracle
      agreement 0.9625).  With const.ID_RANK_PENALTY (2^24, ulp 2.0) the
      acoustic order survives the shift.
    The float64 oracle applies the identical rules; ids must match exactly.
    """
    import jax.numpy as jnp

    from snickery_tpu.const import ID_RANK_PENALTY
    from snickery_tpu.synth import DeviceDB, synth_pipeline_step

    d, M, T, k = 4, 256, 2, 4
    feats = np.full((M, d), 100.0, np.float32)
    feats[0] = [11.0, 0, 0, 0]     # code 7: step-1 sq 121
    feats[1] = [12.0, 0, 0, 0]     # code 7: step-1 sq 144
    feats[2] = [13.0, 0, 0, 0]     # code 7: step-1 sq 169
    feats[3] = [14.0, 0, 0, 0]     # code 7: step-1 sq 196
    feats[5] = [10.0, 0, 0, 0]     # code 7: step-1 sq 100 -- best fallback,
    #                                id above the absorbed-tie pool cutoff
    feats[8] = [0, 90.0, 0, 0]     # code 0: step-0 dist 103.0
    feats[9] = [0, 89.0, 0, 0]     # code 0: step-0 dist 102.1 -> wins step 0
    codes = np.full(M, 7, np.int32)
    codes[8] = codes[9] = 0
    ctx = np.zeros((M, 5), np.int32)

    targets = np.zeros((T, d), np.float32)
    targets[0] = [50.0, 0, 0, 0]   # mismatched unit 0 is CLOSER (39 < 102)
    tgt_codes = np.asarray([0, 3], np.int32)   # step 1: no unit has code 3
    tgt_ctx = np.zeros((T, 5), np.int32)

    taper = 4
    cut1 = (np.arange(M, dtype=np.int32) * 8) + 16
    cut2 = cut1 + 8
    from snickery_tpu.voicedb.device_layout import build_raw_blocks
    # joins are irrelevant here (jcw = 0): any jr rows do; zeros make every
    # row a jr-exception, exercising the pointer path
    raw_block, _, _ = build_raw_blocks(
        feats, np.zeros((M, d), np.float32), M, ndb=1)
    db = DeviceDB(
        raw=jnp.asarray(raw_block),
        n_real=jnp.int32(M),
        cut1=jnp.asarray(cut1), cut2=jnp.asarray(cut2),
        waves=jnp.zeros(int(cut2[-1]) + 64, jnp.float32),
        wave_scale=jnp.float32(1.0),
        mean_t=jnp.zeros(d, jnp.float32), std_t=jnp.ones(d, jnp.float32),
        sqrt_wt=jnp.ones(d, jnp.float32),
        mean_j=jnp.zeros(d, jnp.float32), std_j=jnp.ones(d, jnp.float32),
        sqrt_wj=jnp.ones(d, jnp.float32),
        codes=jnp.asarray(codes), ctx=jnp.asarray(ctx),
        vids=jnp.zeros(M, jnp.int32),
    )
    unit_ids, _, _, _ = synth_pipeline_step(
        db, jnp.asarray(targets), jnp.int32(T), jnp.asarray(tgt_codes),
        jnp.asarray(tgt_ctx), jnp.zeros(T, jnp.int32),
        jnp.float32(0.0), jnp.float32(0.0),
        n_cand=k, chunk=M, greedy=False, halfphone=True,
        max_frag=8 + 2 * taper, out_len=128, taper=taper)
    ids_dev = np.asarray(unit_ids)

    # float64 oracle with the same (identity-only) linguistic penalties
    id_pen = (tgt_codes[:, None] != codes[None, :]) * float(ID_RANK_PENALTY)
    ids_ref, _ = oracle.synth_pipeline(
        targets.astype(np.float64), feats.astype(np.float64),
        np.zeros((M, d)), np.zeros((M, d)),
        n_candidates=k, join_cost_weight=0.0,
        extra=id_pen, lattice_penalty=id_pen)

    assert ids_dev[0] == 9, f"same-name unit must win step 0, got {ids_dev[0]}"
    assert ids_dev[1] == 5, f"best fallback must win step 1, got {ids_dev[1]}"
    np.testing.assert_array_equal(ids_dev, ids_ref)


def test_wide_join_context_voice():
    """join_context_frames=2 (round 4): join contexts span 2 epoch frames.

    Invariants: join dims double; join_left stays a prefix of the unit's own
    target row (required by the raw device layout, verified at Synthesiser
    init); corpus-consecutive units still have bit-equal jr[i] == jl[i+1]
    (the zero-cost natural path); a natural target still resynthesises its
    training utterance through overwhelmingly natural continuations; and the
    oracle agrees with the device pipeline at the wider dj."""
    from tests.toyvoice import SR, prepare_toy_utts, synth_utterance, toy_config
    from snickery_tpu.features.epochs import detect_epochs
    from snickery_tpu.features.magphase import magphase_analysis
    from snickery_tpu.voicedb.build import build_voicedb

    cfg = toy_config(multiepoch=2, join_context_frames=2)
    utts = prepare_toy_utts(3)
    db = build_voicedb(cfg, utts)
    d = cfg.target_dim
    assert db.join_dim == 2 * d
    assert db.target_dim == 2 * d
    np.testing.assert_array_equal(db.join_left, db.unit_features[:, : 2 * d])
    # zero-cost natural path: consecutive units of one utterance share
    # bit-equal join contexts across the full 2-frame width
    same_utt = (db.utt_index[1:] == db.utt_index[:-1]) & (
        db.unit_pos[1:] == db.unit_pos[:-1] + 1)
    assert same_utt.sum() > 50
    np.testing.assert_array_equal(db.join_right[:-1][same_utt],
                                  db.join_left[1:][same_utt])

    synth = Synthesiser(cfg, db=db)
    utt = utts[0]
    result = synth.synth_from_features(utt.features)
    ids = result["unit_ids"]
    pos = db.unit_pos[ids]
    assert (np.diff(pos) == 1).mean() > 0.8, "natural continuation broke"

    # held-out target: device pipeline vs float64 oracle at dj = 2*d
    wave, _ = synth_utterance(901, n_segments=6)
    epochs = detect_epochs(wave, SR, use_native=False)
    streams = magphase_analysis(wave, epochs, SR)
    feats = np.concatenate([streams[s] for s in cfg.stream_list], axis=1)
    tgt, n = synth.targets_from_features(feats)
    r = synth.synth_from_features(feats)
    tw = (((tgt - db.mean_target) / db.std_target)
          * synth._sqrt_wt[None, :]).astype(np.float32)
    feats_w = (db.normalised_features().astype(np.float32)
               * synth._sqrt_wt[None, :])
    jl, jr = db.normalised_joins()
    jl = (jl * synth._sqrt_wj[None, :]).astype(np.float32)
    jr = (jr * synth._sqrt_wj[None, :]).astype(np.float32)
    ids_ref, _ = oracle.synth_pipeline(
        tw, feats_w, jl, jr, n_candidates=cfg.n_candidates,
        join_cost_weight=cfg.join_cost_weight)
    agree = (r["unit_ids"] == ids_ref).mean()
    assert agree >= 0.99, f"agreement {agree} at join_context_frames=2"


def test_tiled_voicedb_equivalent_decode(epoch_voice):
    """VoiceDB.tiled(k) (capacity/perf testing): replicas are bit-identical,
    so synthesis from the tiled DB must produce a unit sequence whose
    per-unit FEATURES and the output waveform match the untiled decode
    exactly (selected ids may point into any replica)."""
    cfg, db, utts, synth = epoch_voice
    db3 = db.tiled(3)
    assert db3.n_units == 3 * db.n_units
    assert len(db3.waves) == 3 * len(db.waves)
    assert db3.wave_offsets[-1] == 3 * db.wave_offsets[-1]
    # self-consistency: every replica's cutpoints land inside its wave copy
    assert (db3.cutpoints[:, 1] < len(db3.waves)).all()
    n = db.n_units
    np.testing.assert_array_equal(np.asarray(db3.unit_features[n:2 * n]),
                                  np.asarray(db.unit_features))

    synth3 = Synthesiser(cfg, db=db3)
    utt = utts[1]
    a = synth.synth_from_features(utt.features)
    b = synth3.synth_from_features(utt.features)
    ids_a, ids_b = a["unit_ids"], b["unit_ids"]
    base_b = ids_b % n
    # replica rows are bit-identical -> tie-class (features+contexts) match
    np.testing.assert_array_equal(
        np.asarray(db.unit_features[ids_a]),
        np.asarray(db3.unit_features[ids_b]))
    np.testing.assert_array_equal(np.asarray(db.join_left[ids_a]),
                                  np.asarray(db3.join_left[ids_b]))
    # waveform fragments come from replicated corpus audio -> same output
    np.testing.assert_allclose(a["wave"], b["wave"], atol=1e-5)
    assert (np.asarray(db.cutpoints[base_b, 2] - db.cutpoints[base_b, 1])
            == np.asarray(db3.cutpoints[ids_b, 2] - db3.cutpoints[ids_b, 1])).all()


@pytest.mark.parametrize("k", [2, 3])
def test_derive_multiepoch_matches_built(k):
    """derive_multiepoch(me1_voice, k) must be BIT-IDENTICAL to building
    the multiepoch=k voice from the same corpus (every array + stats):
    bench.py's me2 mode relies on this to certify the me2 operating point
    on a cold cache without a second corpus build (VERDICT r4 item 2)."""
    from tests.toyvoice import build_toy_voice, toy_config
    from snickery_tpu.voicedb.build import build_voicedb, derive_multiepoch

    cfg1, db1, utts = build_toy_voice(halfphone=False, multiepoch=1)
    cfg_k = toy_config(target_representation="epoch", multiepoch=k)
    built = build_voicedb(cfg_k, utts)
    derived = derive_multiepoch(db1, k)

    assert derived.n_units == built.n_units
    assert derived.multiepoch == built.multiepoch == k
    for name in ("unit_features", "join_left", "join_right", "cutpoints",
                 "utt_index", "unit_pos", "unit_lf0", "unit_code",
                 "context_codes", "mean_target", "std_target", "mean_join",
                 "std_join", "waves", "wave_offsets", "voice_ids"):
        a, b = getattr(derived, name), getattr(built, name)
        assert a.dtype == b.dtype, name
        np.testing.assert_array_equal(a, b, err_msg=name)
    assert derived.filenames == built.filenames
    assert derived.sample_rate == built.sample_rate


def test_derive_multiepoch_rejects_bad_sources():
    from tests.toyvoice import build_toy_voice
    from snickery_tpu.voicedb.build import derive_multiepoch

    _, db_hp, _ = build_toy_voice(halfphone=True)
    with pytest.raises(ValueError, match="epoch-unit"):
        derive_multiepoch(db_hp, 2)
    _, db2, _ = build_toy_voice(halfphone=False, multiepoch=2)
    with pytest.raises(ValueError, match="multiepoch=1"):
        derive_multiepoch(db2, 2)
    _, db1, _ = build_toy_voice(halfphone=False, multiepoch=1)
    with pytest.raises(ValueError, match="k must be"):
        derive_multiepoch(db1, 1)


def test_colmajor_raw_block_layout_identical(epoch_voice):
    """raw_block_layout="colmajor" (the capacity-scale layout that removes
    the lane-padded relayout copy of the resident raw block — VERDICT r4
    item 1) must select identical unit sequences and audio to the default
    layout, on both the XLA and the (interpret-mode) Pallas paths."""
    from tests.toyvoice import prepare_toy_utts, toy_config
    cfg_d, db, utts, synth_default = epoch_voice
    utt = prepare_toy_utts(1, seed0=901)[0]
    ref = synth_default.synth_from_features(utt.features)

    for use_pallas in (False, "interpret"):
        cfg = toy_config(raw_block_layout="colmajor", use_pallas=use_pallas)
        synth_cm = Synthesiser(cfg, db=db)
        assert synth_cm.device_db.raw.format.layout.major_to_minor == (0, 1)
        r = synth_cm.synth_from_features(utt.features)
        np.testing.assert_array_equal(r["unit_ids"], ref["unit_ids"])
        np.testing.assert_allclose(r["wave"], ref["wave"], atol=1e-5)
