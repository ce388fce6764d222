"""bench.agreement_metrics: tie-adjusted agreement + f64 path-cost gap.

The helper is the round-3 fidelity criterion (ARCHITECTURE.md "Numerical
fidelity"): raw id agreement understates correctness when corpora contain
bit-identical units, so mismatches among bit-interchangeable units (equal
feature row AND both join contexts) count as agreement, and the total
float64 path-cost gap is reported as the rigorous optimality check.
"""

import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import agreement_metrics  # noqa: E402


def _fixture(seed=5, m=64, d=6):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((m, d)).astype(np.float32)
    jl = rng.standard_normal((m, d)).astype(np.float32)
    jr = rng.standard_normal((m, d)).astype(np.float32)
    # unit 10 is a bit-identical duplicate of unit 3 (feats + both contexts);
    # unit 20 shares only the feature row with unit 4 (contexts differ)
    feats[10], jl[10], jr[10] = feats[3], jl[3], jr[3]
    feats[20] = feats[4]
    db = types.SimpleNamespace(
        unit_features=feats, join_left=jl, join_right=jr,
        mean_target=np.zeros(d, np.float32), std_target=np.ones(d, np.float32),
        mean_join=np.zeros(d, np.float32), std_join=np.ones(d, np.float32))
    synth = types.SimpleNamespace(
        _sqrt_wt=np.ones(d, np.float32), _sqrt_wj=np.ones(d, np.float32))
    return db, synth, rng


def test_identical_sequences():
    db, synth, rng = _fixture()
    ids = rng.integers(0, 64, 12).astype(np.int32)
    tw = rng.standard_normal((12, 6)).astype(np.float32)
    raw, adj, gap = agreement_metrics(ids, ids.copy(), tw, db, synth, 0.5)
    assert raw == 1.0 and adj == 1.0 and gap == 0.0


def test_duplicate_swap_is_tie_adjusted():
    db, synth, rng = _fixture()
    ids_ref = np.array([1, 3, 7, 9], np.int32)
    ids_dev = np.array([1, 10, 7, 9], np.int32)   # 10 ≡ 3 (full duplicate)
    tw = rng.standard_normal((4, 6)).astype(np.float32)
    raw, adj, gap = agreement_metrics(ids_dev, ids_ref, tw, db, synth, 0.5)
    assert raw == 0.75
    assert adj == 1.0
    assert abs(gap) < 1e-12        # identical contexts -> identical f64 cost


def test_feature_only_duplicate_not_adjusted():
    db, synth, rng = _fixture()
    ids_ref = np.array([1, 4, 7, 9], np.int32)
    ids_dev = np.array([1, 20, 7, 9], np.int32)   # 20 shares feats, NOT ctx
    tw = rng.standard_normal((4, 6)).astype(np.float32)
    raw, adj, gap = agreement_metrics(ids_dev, ids_ref, tw, db, synth, 0.5)
    assert raw == 0.75
    assert adj == 0.75             # join contexts differ: not interchangeable
    assert gap != 0.0              # and the path cost shows it


def test_worse_sequence_has_positive_gap():
    db, synth, rng = _fixture()
    tw = db.unit_features[np.array([2, 5, 8])].copy()   # exact targets
    ids_ref = np.array([2, 5, 8], np.int32)             # zero target cost
    ids_dev = np.array([2, 6, 8], np.int32)             # off-target middle
    raw, adj, gap = agreement_metrics(ids_dev, ids_ref, tw, db, synth, 0.5)
    assert gap > 0.0


def test_bulk_analyse_matches_per_utterance():
    """Grouped + uniform-shape-padded analysis is bit-identical to direct
    per-utterance magphase_analysis (the padding scheme mirrors what
    magphase_analysis itself applies, so real rows must not move)."""
    from bench import bulk_analyse
    from snickery_tpu.features.epochs import detect_epochs
    from snickery_tpu.features.magphase import magphase_analysis
    from tests.toyvoice import SR, synth_utterance

    waves = [synth_utterance(800 + i, n_segments=3)[0] for i in range(4)]
    eps = [detect_epochs(w, SR, use_native=False) for w in waves]
    # group_epochs small enough to force several groups of uneven sizes
    group_epochs = max(len(e) for e in eps) + 1
    got = bulk_analyse(waves, eps, group_epochs=group_epochs)
    for w, e, f in zip(waves, eps, got):
        streams = magphase_analysis(w, e, SR, n_mag=60, n_phase=45)
        want = np.concatenate(
            [streams["mag"], streams["real"], streams["imag"],
             streams["lf0"]], axis=1).astype(np.float32)
        assert f.shape == want.shape
        np.testing.assert_array_equal(f, want)
