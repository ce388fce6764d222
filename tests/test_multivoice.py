"""Multi-voice merged DB: batch-mixed voices select only own-voice units."""

import numpy as np
import jax.numpy as jnp
import pytest

from snickery_tpu import utils
from snickery_tpu.parallel import batched_synth_step, make_mesh, shard_voice
from snickery_tpu.synth import Synthesiser, _stream_weight_vector
from snickery_tpu.voicedb.multivoice import merge_voicedbs
from tests.toyvoice import build_toy_voice


@pytest.fixture(scope="module")
def two_voices():
    cfg_a, db_a, utts_a = build_toy_voice(halfphone=False, n_utts=2)
    cfg_b, db_b, utts_b = build_toy_voice(halfphone=False, n_utts=2)
    # make voice B genuinely different material
    for u in utts_b:
        u.wave = u.wave * 0.8
    merged = merge_voicedbs([db_a, db_b], names=["alice", "bob"])
    return cfg_a, merged, (utts_a, utts_b), (db_a, db_b)


def test_merge_counts(two_voices):
    cfg, merged, (utts_a, utts_b), (db_a, db_b) = two_voices
    assert merged.n_units == db_a.n_units + db_b.n_units
    assert merged.voice_names == ["alice", "bob"]
    assert merged.is_multivoice
    assert (merged.voice_ids[: db_a.n_units] == 0).all()
    assert (merged.voice_ids[db_a.n_units:] == 1).all()
    assert len(merged.waves) == len(db_a.waves) + len(db_b.waves)


def test_multivoice_batch_respects_partition(two_voices):
    cfg, merged, (utts_a, utts_b), (db_a, db_b) = two_voices
    mesh = make_mesh(2, 4)   # 8 virtual cpu devices: 2 data x 4 db shards

    chunk = 512
    mp = utils.next_multiple(merged.n_units, chunk * 4)
    from snickery_tpu.voicedb.device_layout import build_raw_blocks
    blocks, _, _ = build_raw_blocks(
        merged.unit_features, merged.join_right, mp, ndb=4)
    sw = np.sqrt(np.tile(_stream_weight_vector(cfg, cfg.target_stream_weights),
                         merged.multiepoch)).astype(np.float32)
    pad = mp - merged.n_units
    cut1 = np.pad(merged.cutpoints[:, 1].astype(np.int32), (0, pad))
    cut2 = np.pad(merged.cutpoints[:, 2].astype(np.int32), (0, pad))
    part = np.pad(merged.voice_ids.astype(np.int32), (0, pad), constant_values=-1)

    dj = merged.join_dim
    sv = shard_voice(mesh, blocks, cut1, cut2,
                     merged.waves.astype(np.float32),
                     merged.mean_target, merged.std_target, sw,
                     merged.mean_join, merged.std_join, np.ones(dj, np.float32),
                     n_real=np.int32(merged.n_units), part=part)

    # batch: 4 utts targeting alice, 4 targeting bob (same feature content);
    # B = 8 because the decode now splits the batch across the WHOLE 2x4
    # mesh (each device decodes B/8 = 1 utterance)
    B, T = 8, 256
    d = merged.target_dim
    tgts = np.zeros((B, T, d), np.float32)
    lengths = np.zeros(B, np.int32)
    vids = np.array([0, 0, 1, 1, 0, 1, 0, 1], np.int32)
    src = [utts_a[0], utts_a[1], utts_b[0], utts_b[1],
           utts_a[2 % len(utts_a)], utts_b[2 % len(utts_b)],
           utts_a[0], utts_b[0]]
    for b, utt in enumerate(src):
        usable = utt.features[1:-1][:T]
        tgts[b, :len(usable)] = usable
        lengths[b] = len(usable)

    out_len = utils.next_multiple(T * 200 + 100, 128)
    unit_ids, costs, audio, totals = batched_synth_step(
        sv, jnp.asarray(tgts), jnp.asarray(lengths),
        jnp.float32(1.0), jnp.float32(0.0), jnp.asarray(vids),
        mesh=mesh, n_cand=8, chunk=chunk, max_frag=512,
        out_len=out_len, taper=cfg.taper_length)
    unit_ids = np.asarray(unit_ids)
    for b in range(B):
        n = lengths[b]
        got_voice = merged.voice_ids[unit_ids[b, :n]]
        assert (got_voice == vids[b]).all(), f"utt {b} leaked across voices"
    assert np.isfinite(np.asarray(costs)).all()
    assert (np.asarray(totals) > 1000).all()


def test_synthesiser_multivoice_api(two_voices):
    """Merged DBs work through the high-level Synthesiser API with a voice
    argument; omitting it raises; selection never leaks across voices."""
    cfg, merged, (utts_a, utts_b), (db_a, db_b) = two_voices
    synth = Synthesiser(cfg, db=merged)
    assert synth.is_multivoice

    with pytest.raises(ValueError):
        synth.synth_from_features(utts_a[0].features)

    for voice, utt in [("alice", utts_a[0]), ("bob", utts_b[0]), (1, utts_b[1])]:
        r = synth.synth_from_features(utt.features, voice=voice)
        vid = synth._voice_code(voice)
        got = merged.voice_ids[r["unit_ids"]]
        assert (got == vid).all(), f"voice {voice} leaked"

    with pytest.raises(KeyError):
        synth.synth_from_features(utts_a[0].features, voice="nobody")

    # batched with mixed voices
    with pytest.raises(ValueError):
        synth.synth_batch([utts_a[0].features])
    results = synth.synth_batch(
        [utts_a[0].features, utts_b[0].features], voices=["alice", "bob"])
    assert (merged.voice_ids[results[0]["unit_ids"]] == 0).all()
    assert (merged.voice_ids[results[1]["unit_ids"]] == 1).all()


def test_halfphone_multivoice_merge_and_synth():
    """Halfphone DBs merge with unified vocabularies; selection respects
    BOTH the voice partition and the halfphone identity."""
    cfg_a, db_a, utts_a = build_toy_voice(halfphone=True, n_utts=2)
    cfg_b, db_b, utts_b = build_toy_voice(halfphone=True, n_utts=2)
    merged = merge_voicedbs([db_a, db_b], names=["alice", "bob"])
    assert merged.target_representation == "halfphone"
    assert merged.voice_names == ["alice", "bob"]
    # vocab remap correctness: unit names survive the merge per unit
    for i in range(db_a.n_units):
        assert merged.unit_names[merged.unit_code[i]] == \
            db_a.unit_names[db_a.unit_code[i]]
    off = db_a.n_units
    for i in range(db_b.n_units):
        assert merged.unit_names[merged.unit_code[off + i]] == \
            db_b.unit_names[db_b.unit_code[i]]

    import dataclasses
    cfg = dataclasses.replace(cfg_a, n_candidates=6)
    synth = Synthesiser(cfg, db=merged)
    assert synth.is_multivoice
    utt = utts_b[0]
    tgt, kept = synth.halfphone_targets_from_features(
        utt.features, utt.epochs, utt.halfphones)
    with pytest.raises(ValueError):
        synth.synth_from_features(tgt, target_segments=kept)
    r = synth.synth_from_features(tgt, target_segments=kept, voice="bob")
    ids = r["unit_ids"]
    assert (merged.voice_ids[ids] == 1).all(), "halfphone merge leaked voices"
    want = np.asarray([synth._unit_vocab[s.name] for s in kept])
    got = merged.unit_code[ids]
    assert (want == got).mean() > 0.9, "halfphone identity lost in merge"

    # batched mixed-voice halfphone synthesis
    tgt_a, kept_a = synth.halfphone_targets_from_features(
        utts_a[0].features, utts_a[0].epochs, utts_a[0].halfphones)
    res = synth.synth_batch([tgt_a, tgt], segments_list=[kept_a, kept],
                            voices=["alice", "bob"])
    assert (merged.voice_ids[res[0]["unit_ids"]] == 0).all()
    assert (merged.voice_ids[res[1]["unit_ids"]] == 1).all()


def test_cli_merge_and_voice_flag(two_voices, tmp_path):
    """`cli merge` + `synth --voice` drive the multi-voice path end-to-end
    from the command line."""
    import dataclasses
    import json
    from snickery_tpu.cli import main as cli_main
    from snickery_tpu.io.speech import read_wave, write_wave
    from tests.toyvoice import SR, synth_utterance

    cfg, merged, (utts_a, utts_b), (db_a, db_b) = two_voices
    pa, pb = str(tmp_path / "a.voicedb"), str(tmp_path / "b.voicedb")
    db_a.save(pa)
    db_b.save(pb)
    out_db = str(tmp_path / "merged.voicedb")
    assert cli_main(["merge", pa, pb, "-o", out_db, "--names", "alice,bob"]) == 0
    from snickery_tpu.voicedb.db import VoiceDB
    m2 = VoiceDB.load(out_db)
    assert m2.voice_names == ["alice", "bob"]
    assert m2.n_units == merged.n_units

    # synth from the merged DB via the CLI with --voice
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    wave, _ = synth_utterance(777, n_segments=4)
    write_wave(wave, str(wav_dir / "t0.wav"), SR)
    cfg_path = tmp_path / "mv.json"
    cfg_d = dataclasses.asdict(cfg)
    cfg_d.update(workdir=str(tmp_path), voice_name="merged",
                 wav_datadir=str(wav_dir))
    cfg_path.write_text(json.dumps(cfg_d))
    out = tmp_path / "out"
    # no --voice -> error
    assert cli_main(["synth", "-c", str(cfg_path), "-o", str(out)]) == 1
    assert cli_main(["synth", "-c", str(cfg_path), "-o", str(out),
                     "--voice", "bob", "--dump-units"]) == 0
    audio, sr = read_wave(str(out / "t0.wav"))
    assert len(audio) > 500
    import numpy as _np
    ids = _np.load(out / "t0.units.npy")
    assert (m2.voice_ids[ids] == 1).all()


def test_streaming_multivoice_requires_and_respects_voice(two_voices):
    """synth_streaming must demand a voice on merged DBs and never leak
    units across the partition (ADVICE.md round 1, medium)."""
    cfg, merged, (utts_a, utts_b), (db_a, db_b) = two_voices
    synth = Synthesiser(cfg, db=merged)
    feats = utts_b[0].features[1:-1]
    n = len(feats)
    chunks = [feats[: n // 2], feats[n // 2:]]

    with pytest.raises(ValueError):
        list(synth.synth_streaming(iter(chunks)))

    audio = list(synth.synth_streaming(iter(chunks), voice="bob"))
    assert sum(len(a) for a in audio) > 1000
    ids = np.concatenate(synth.last_stream_unit_ids)
    assert len(ids) > 10
    assert (merged.voice_ids[ids] == 1).all(), "streaming leaked across voices"
