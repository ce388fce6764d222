"""Config system tests: exec'd .cfg files, JSON, key vocabulary, validation."""

import json

import pytest

from snickery_tpu.config import SnickeryConfig, load_config, config_from_dict


def test_defaults():
    cfg = SnickeryConfig()
    assert cfg.n_candidates == 30
    assert cfg.target_dim == 61
    assert cfg.stream_slices == [("mag", 0, 60), ("lf0", 60, 61)]


def test_exec_cfg(tmp_path):
    p = tmp_path / "voice.cfg"
    p.write_text(
        "workdir = '/tmp/w'\n"
        "stream_list = ['mag', 'real', 'imag', 'lf0']\n"
        "datadims = {'mag': 60, 'real': 45, 'imag': 45, 'lf0': 1}\n"
        "n_candidates = 50\n"
        "join_cost_weight = 0.5\n"
        "target_stream_weights = [1.0, 0.5, 0.5, 2.0]\n"
        "join_stream_weights = 1.0\n"     # scalar broadcast
        "multiepoch = 4\n"
    )
    cfg = load_config(str(p))
    assert cfg.n_candidates == 50
    assert cfg.target_dim == 151
    assert cfg.join_stream_weights == [1.0] * 4
    assert cfg.multiepoch == 4


def test_json_cfg(tmp_path):
    p = tmp_path / "voice.json"
    p.write_text(json.dumps({"voice_name": "slt", "n_candidates": 10}))
    cfg = load_config(str(p))
    assert cfg.voice_name == "slt"
    assert cfg.n_candidates == 10


def test_alias_and_unknown_keys():
    cfg = config_from_dict({"wave_datadir": "/d/wav", "mystery_key": 1})
    assert cfg.wav_datadir == "/d/wav"
    assert cfg._extra == {"mystery_key": 1}
    with pytest.raises(KeyError):
        config_from_dict({"mystery_key": 1}, strict=True)


def test_validation():
    with pytest.raises(ValueError):
        SnickeryConfig(target_representation="diphone")
    with pytest.raises(ValueError):
        SnickeryConfig(multiepoch=0)
    with pytest.raises(ValueError):
        SnickeryConfig(target_stream_weights=[1.0, 2.0, 3.0])


def test_snickery_platform_env_overrides_backend():
    """SNICKERY_PLATFORM=cpu must beat a pre-set JAX_PLATFORMS (hosted
    environments pre-import jax with their own platform; the package
    applies the config-API override at import, before backend init)."""
    import os
    import subprocess
    import sys

    env = {**os.environ, "SNICKERY_PLATFORM": "cpu",
           "JAX_PLATFORMS": "axon"}
    out = subprocess.run(
        [sys.executable, "-c",
         "import snickery_tpu, jax; print(jax.devices()[0].platform)"],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().splitlines()[-1] == "cpu"
