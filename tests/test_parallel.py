"""Multi-chip tests on the 8-virtual-device CPU mesh: sharded-DB batched
synthesis must match the single-device pipeline exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from snickery_tpu import utils
from snickery_tpu.parallel import (
    batched_synth_step, make_mesh, shard_voice, sharded_norm_stats,
)
from snickery_tpu.synth import Synthesiser
from tests.toyvoice import build_toy_voice


@pytest.fixture(scope="module")
def voice():
    cfg, db, utts = build_toy_voice(halfphone=False, multiepoch=1)
    return cfg, db, utts, Synthesiser(cfg, db=db)


def _padded_db_arrays(synth, n_db: int):
    """Re-pad the DB so rows divide n_db (uses the Synthesiser's arrays)."""
    ddb = synth.device_db
    feats = np.asarray(ddb.feats)
    mp = utils.next_multiple(feats.shape[0], synth.chunk * n_db)
    pad = mp - feats.shape[0]
    feats = np.pad(feats, ((0, pad), (0, 0)), constant_values=1e6)
    jl = np.pad(np.asarray(ddb.jl), ((0, pad), (0, 0)))
    jr = np.pad(np.asarray(ddb.jr), ((0, pad), (0, 0)))
    cut1 = np.pad(np.asarray(ddb.cut1), (0, pad))
    cut2 = np.pad(np.asarray(ddb.cut2), (0, pad))
    return feats, jl, jr, cut1, cut2


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_batched_sharded_matches_single_device(voice, mesh_shape):
    cfg, db, utts, synth = voice
    n_data, n_db = mesh_shape
    mesh = make_mesh(n_data, n_db)

    feats, jl, jr, cut1, cut2 = _padded_db_arrays(synth, n_db)
    sv = shard_voice(
        mesh, feats, jl, jr, cut1, cut2,
        np.asarray(synth.device_db.waves),
        np.asarray(synth.device_db.mean_t), np.asarray(synth.device_db.std_t),
        np.asarray(synth.device_db.sqrt_wt))

    # batch of 8 targets (reuse/repeat the toy utterances), padded to T=128
    B, T = 8, 256
    tgts = np.zeros((B, T, db.target_dim), np.float32)
    lengths = np.zeros(B, np.int32)
    singles = []
    for b in range(B):
        utt = utts[b % len(utts)]
        tu, n = synth.targets_from_features(utt.features)
        n = min(n, T)
        tgts[b, :n] = tu[:n]
        lengths[b] = n
        singles.append(synth.synth_from_features(utt.features))

    out_len = utils.next_multiple(T * synth.max_span + 2 * cfg.taper_length, 128)
    unit_ids, costs, audio, totals = batched_synth_step(
        sv, jnp.asarray(tgts), jnp.asarray(lengths),
        jnp.float32(cfg.join_cost_weight), jnp.float32(cfg.search_epsilon),
        mesh=mesh, n_cand=min(cfg.n_candidates, feats.shape[0]),
        chunk=synth.chunk, max_frag=synth.max_frag, out_len=out_len,
        taper=cfg.taper_length)
    unit_ids = np.asarray(unit_ids)
    audio = np.asarray(audio)

    for b in range(B):
        n = lengths[b]
        ref = singles[b]
        agree = (unit_ids[b, :n] == ref["unit_ids"][:n]).mean()
        assert agree >= 0.99, f"mesh {mesh_shape} utt {b}: agreement {agree}"
        # audio identical where the unit sequences agree fully
        if agree == 1.0:
            m = int(np.asarray(totals)[b])
            np.testing.assert_allclose(
                audio[b, :m], ref["wave"][:m], atol=1e-4)


def test_sharded_norm_stats(voice):
    cfg, db, utts, synth = voice
    mesh = make_mesh(4, 2)
    feats = db.unit_features.astype(np.float32)
    mp = utils.next_multiple(len(feats), 8)
    padded = np.pad(feats, ((0, mp - len(feats)), (0, 0)))   # zero rows
    mean, std = sharded_norm_stats(
        jnp.asarray(padded), jnp.float32(len(feats)), mesh=mesh)
    np.testing.assert_allclose(np.asarray(mean), feats.mean(0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(std), feats.std(0), rtol=1e-3, atol=1e-3)
