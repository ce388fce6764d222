"""I/O: headerless float streams, wav, EST pitchmarks, HTS labels."""

from snickery_tpu.io.speech import (
    get_speech,
    put_speech,
    read_wave,
    write_wave,
)
from snickery_tpu.io.est import read_est_pitchmarks, write_est_pitchmarks
from snickery_tpu.io.labels import read_hts_label, halfphone_segments

__all__ = [
    "get_speech",
    "put_speech",
    "read_wave",
    "write_wave",
    "read_est_pitchmarks",
    "write_est_pitchmarks",
    "read_hts_label",
    "halfphone_segments",
]
