"""The driver parses the LAST stdout line of bench.py as JSON, capturing at
most ~2,000 trailing chars.  Round 3's line was 2,558 chars and was recorded
truncated mid-JSON (BENCH_r03.json parsed=null despite rc=0).  These tests pin
the compact-line contract: with EVERY config populated at round-3 fullness
plus every failure flag bench.py can set, the final line stays under 1,500
chars and is strict JSON.
"""

import json
import sys

import bench


def _populate_worst_case():
    # round-3 real values (BENCH_r03.json tail) — the fattest extra observed —
    # plus an error + skip marker for every mode and both kill flags.
    full = {
        "config3": {
            "rtf": 0.0015570367116338883, "ms_per_step": 965.4769897460938,
            "n_units": 1049787, "batch": 32, "bucket_T": 512,
            "mm_precision": "split3cat",
            "agreement_vs_f32": 0.919247269583116,
            "agreement_vs_f32_tie_adjusted": 0.9799471634347645,
            "f32_gate_worst_cost_gap_rel": 0.0010672838678415,
            "agreement_vs_f64_oracle": 0.98125,
            "agreement_tie_adjusted": 1.0,
            "oracle_path_cost_gap_rel": 0.0,
        },
        "mode_sec": {"epoch": 132.9, "pallas": 0.8, "streaming": 11.6,
                     "halfphone": 15.5, "multivoice": 25.4, "toy": 9.7,
                     "48k": 8.6, "me2": 132.7, "quality": 11.6},
        "pallas_compiled_vs_interpret": True,
        "config4": {"chunk_latency_p50_ms": 44.762372970581055,
                    "chunk_latency_p95_ms": 52.58030891418456,
                    "rtf": 0.23505622259279718,
                    "input": "fixed_rate_dnn_style",
                    "frameshift_ms": 5.0, "chunk_frames": 32},
        "config4_natural": {"chunk_latency_p50_ms": 72.07393646240234,
                            "chunk_latency_p95_ms": 89.1552448272705,
                            "rtf": 0.2482205042430162, "chunk_units": 32},
        "config2": {"rtf": 0.0006780096534251438,
                    "ms_per_step": 16.269731521606445, "n_units": 50000,
                    "halfphone_identity_match": 1.0,
                    "agreement_vs_f64_oracle": 1.0,
                    "agreement_tie_adjusted": 1.0,
                    "oracle_path_cost_gap_rel": 0.0},
        "config5": {"rtf": 0.0009457989886347744,
                    "ms_per_step": 145.9263801574707, "batch": 64,
                    "n_voices": 8, "cross_voice_leaks": 0},
        "config1": {"latency_ms": 101.21798515319824, "n_units": 38507,
                    "audio_sec": 5.241875,
                    "held_out_mcd_db": 28.018917688746672,
                    "natural_reconstruction_mcd_db": 4.018429116045569,
                    "held_out_ffe": 0.24260360414471183,
                    "held_out_f0_rmse_hz": 18.828201293945312,
                    "join_flux_ratio": 1.1633540578985058,
                    "n_nonnatural_joins": 408},
        "config_48k": {"latency_ms": 353.21366786956787,
                       "rtf": 0.058809114538817306, "n_units": 13553,
                       "sample_rate": 48000,
                       "agreement_vs_f64_oracle": 0.9984301412872841,
                       "agreement_tie_adjusted": 1.0,
                       "oracle_path_cost_gap_rel": 0.0},
        "config3_me2": {"rtf": 0.0010842294344135682,
                        "ms_per_step": 679.1094779968262,
                        "n_units": 1049787, "multiepoch": 2,
                        # round-4: me2 is certified by the same gates as the
                        # headline mode, so its line share grows too
                        "agreement_vs_f32": 0.99991,
                        "agreement_vs_f32_tie_adjusted": 0.9999612487792969,
                        "f32_gate_worst_cost_gap_rel": 2.3374992573611895e-05,
                        "agreement_vs_f64_oracle": 0.998046875,
                        "agreement_tie_adjusted": 0.998046875,
                        "oracle_path_cost_gap_rel": 2.4524986784781213e-07},
        "capacity": {"n_units": 8388608, "rtf": 0.0123,
                     "agreement_split3_vs_highest": 0.99997,
                     "agreement_tie_adjusted": 1.0},
        "quality_trend": [
            {"voice": "benchtoy", "n_units": 38507,
             "held_out_mcd_db": 28.018917688746672,
             "ffe": 0.24260360414471183,
             "f0_rmse_hz": 18.828201293945312,
             "join_flux_ratio": 1.2755226782012734},
            {"voice": "benchmid", "n_units": 169129,
             "held_out_mcd_db": 23.046178243539163,
             "ffe": 0.2141776499525352,
             "join_flux_ratio": 1.4153593415889691},
            {"voice": "bench1m", "n_units": 1047824,
             "held_out_mcd_db": 17.79146468432565,
             "ffe": 0.16401088989500665,
             "join_flux_ratio": 1.3976395665941748},
        ],
        "bench_elapsed_sec": 387.5,
        "killed_by_signal": 15,
        "killed_by_watchdog": 1199.9,
    }
    # worst case: every mode ALSO records an error and a budget skip
    for mode in ("epoch", "pallas", "halfphone", "streaming", "multivoice",
                 "toy", "48k", "quality", "me2", "capacity"):
        full[mode + "_error"] = ("RuntimeError: " + "x" * 200)
        full[mode + "_skipped"] = "budget"
    return full


def test_final_line_fits_driver_tail_capture(monkeypatch):
    monkeypatch.setitem(bench._STATE, "extra", _populate_worst_case())
    monkeypatch.setitem(bench._STATE, "rtf", 0.0015570367116338883)
    line = bench._result_line()
    assert len(line) < 1500, f"final line is {len(line)} chars: {line}"
    parsed = json.loads(line)  # strict JSON
    assert parsed["metric"] == "synthesis_rtf"
    assert parsed["value"] > 0
    # the headline gate numbers survive compaction
    assert "agreement_tie_adjusted" in parsed["extra"]["config3"]
    assert "agreement_vs_f32_tie_adjusted" in parsed["extra"]["config3"]
    assert parsed["extra"]["detail"] == "BENCH_full.json"
    # errors collapse to exception type; skips to a mode list
    assert parsed["extra"]["errors"]["epoch"] == "RuntimeError"
    assert "me2" in parsed["extra"]["skipped"]


def test_full_line_keeps_everything(monkeypatch):
    monkeypatch.setitem(bench._STATE, "extra", _populate_worst_case())
    monkeypatch.setitem(bench._STATE, "rtf", 0.002)
    parsed = json.loads(bench._full_line())
    assert parsed["extra"]["config1"]["held_out_mcd_db"] > 0
    assert len(parsed["extra"]["quality_trend"]) == 3


def test_nan_stays_strict_json(monkeypatch):
    monkeypatch.setitem(bench._STATE, "extra",
                        {"config3": {"rtf": float("nan")}})
    monkeypatch.setitem(bench._STATE, "rtf", float("nan"))
    parsed = json.loads(bench._result_line())
    assert parsed["value"] is None
    assert parsed["extra"]["config3"]["rtf"] is None


def test_merge_clears_stale_skip_flags(monkeypatch, tmp_path):
    """BENCH_full.json after a merge must never say both "<mode result>"
    and "<mode>_skipped" (VERDICT r4 weak #3): a previous record's skip or
    error flag is dropped whenever the merged record carries the mode's
    result block, and an error supersedes a stale skip."""
    import os
    full_path = tmp_path / "BENCH_full.json"
    # previous record: full run where quality ran but me2 was skipped and
    # toy errored
    prev = {"metric": "synthesis_rtf", "value": 0.002, "vs_baseline": 0.66,
            "extra": {"config3": {"rtf": 0.002},
                      "quality_trend": [{"voice": "benchtoy"}],
                      "me2_skipped": "budget",
                      "toy_error": "RuntimeError: boom",
                      "mode_sec": {"epoch": 100.0}}}
    full_path.write_text(json.dumps(prev))
    # new mode-restricted run: me2 + toy produced results, quality skipped
    monkeypatch.setitem(bench._STATE, "rtf", float("nan"))
    monkeypatch.setitem(bench._STATE, "extra", {
        "config3_me2": {"rtf": 0.0011},
        "config1": {"latency_ms": 80.0},
        "quality_skipped": "budget",
        "mode_sec": {"me2": 150.0},
    })
    monkeypatch.setattr(bench, "cache_dir", lambda: str(tmp_path))
    real_dirname = os.path.dirname
    monkeypatch.setattr(
        bench.os.path, "dirname",
        lambda p: str(tmp_path) if p.endswith("bench.py") else real_dirname(p))
    bench.flush_partial()
    rec = json.loads(full_path.read_text())
    extra = rec["extra"]
    # this run's results landed; prior blocks survived the merge
    assert extra["config3_me2"]["rtf"] == 0.0011
    assert extra["config3"]["rtf"] == 0.002
    # the stale flags contradicted by result blocks are gone
    assert "me2_skipped" not in extra           # prev skip vs new block
    assert "toy_error" not in extra             # prev error vs new block
    # quality_trend was inherited -> this run's skip flag is dropped too
    assert "quality_skipped" not in extra
    # headline inherited from prev when this run had none
    assert rec["value"] == 0.002
    # invariant: no mode has both a result block and a skip/error flag
    for mode, blocks in bench.MODE_BLOCKS.items():
        if any(b in extra for b in blocks):
            assert mode + "_skipped" not in extra
            assert mode + "_error" not in extra
    # mode_sec merged across runs
    assert rec["extra"]["mode_sec"] == {"epoch": 100.0, "me2": 150.0}


def test_merge_never_inherits_per_run_kill_flags(monkeypatch, tmp_path):
    """killed_by_signal / killed_by_watchdog / bench_elapsed_sec describe
    ONE run; a later merge must not resurrect them (a doomed tunnel-outage
    run would otherwise brand every future record as killed)."""
    import os
    full_path = tmp_path / "BENCH_full.json"
    prev = {"metric": "synthesis_rtf", "value": 0.002, "vs_baseline": 0.66,
            "extra": {"config3": {"rtf": 0.002}, "killed_by_signal": 15,
                      "killed_by_watchdog": 1199.9,
                      "bench_elapsed_sec": 1500.0}}
    full_path.write_text(json.dumps(prev))
    monkeypatch.setitem(bench._STATE, "rtf", 0.0016)
    monkeypatch.setitem(bench._STATE, "extra",
                        {"config3": {"rtf": 0.0016},
                         "bench_elapsed_sec": 250.0})
    monkeypatch.setattr(bench, "cache_dir", lambda: str(tmp_path))
    real_dirname = os.path.dirname
    monkeypatch.setattr(
        bench.os.path, "dirname",
        lambda p: str(tmp_path) if p.endswith("bench.py") else real_dirname(p))
    bench.flush_partial()
    rec = json.loads(full_path.read_text())
    assert "killed_by_signal" not in rec["extra"]
    assert "killed_by_watchdog" not in rec["extra"]
    assert rec["extra"]["bench_elapsed_sec"] == 250.0
    assert rec["extra"]["config3"]["rtf"] == 0.0016


def test_device_bytes_in_use_live_arrays_fallback():
    # axon's Device.memory_stats() returns None (not an exception); the
    # helper must fall back to summing live committed arrays so the
    # capacity mode records a measured HBM number instead of null.
    import jax.numpy as jnp

    x = jnp.ones((256, 1024), jnp.float32)  # 1 MiB resident
    gb, src = bench.device_bytes_in_use()
    assert gb is not None and gb >= x.nbytes / 2**30
    assert src in ("memory_stats", "live_arrays")
