"""Voice database: unit cutting, feature assembly, serialization.

Replaces the reference's HDF5 voice DB (script/train_halfphone.py output —
SURVEY.md §2 row 1, §5.4; unverified, mount empty) with a directory artifact
of flat .npy arrays + JSON manifest, designed for fast host->HBM upload and
row-sharding across a device mesh.
"""

from snickery_tpu.voicedb.db import VoiceDB
from snickery_tpu.voicedb.build import build_voicedb, UtteranceData

__all__ = ["VoiceDB", "build_voicedb", "UtteranceData"]
