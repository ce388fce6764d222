"""Multi-voice unit databases.

BASELINE.json config #5: "Multi-voice sharded unit DB across v5e-8,
batch-64 concurrent synthesis".  The reference has no multi-voice concept
(one HDF5 DB per voice); this module merges several VoiceDBs into one
row-space so a single sharded device DB serves concurrent requests for
different voices.  Selection is restricted per utterance via the fused
partition mask in ops.topk (a hard penalty for units of other voices),
so one batched step can mix voices freely.

Normalisation: the merged DB keeps a single global mean/std (computed over
all voices' units) so distances stay comparable inside one compiled
program; per-voice statistics are preserved in the manifest for diagnostics.
"""

from __future__ import annotations

import numpy as np

from snickery_tpu import utils
from snickery_tpu.voicedb.db import VoiceDB


def merge_voicedbs(dbs: list[VoiceDB], names: list[str] | None = None) -> VoiceDB:
    """Concatenate several compatible VoiceDBs into one multi-voice DB.

    The result's ``unit_code`` is reused as the per-unit voice id in epoch
    mode (epoch DBs have no halfphone codes); halfphone multi-voice DBs
    keep their codes and carry voice ids in ``context_codes[:, 0]``'s spare
    range — for simplicity this round only epoch-mode merging is supported.
    """
    if not dbs:
        raise ValueError("no voice DBs to merge")
    base = dbs[0]
    for db in dbs[1:]:
        if db.target_representation != base.target_representation:
            raise ValueError("cannot merge different unit types")
        if db.target_dim != base.target_dim or db.sample_rate != base.sample_rate:
            raise ValueError("cannot merge DBs with different dims/sample rates")
    if base.target_representation == "halfphone":
        raise NotImplementedError("multi-voice merging supports epoch/sample DBs")
    names = names or [f"voice{i}" for i in range(len(dbs))]

    feats = np.concatenate([db.unit_features for db in dbs])
    mean_t = feats.mean(axis=0).astype(np.float32)
    std_t = np.maximum(feats.std(axis=0), 1e-8).astype(np.float32)
    joins = np.concatenate([np.concatenate([db.join_left, db.join_right]) for db in dbs])
    mean_j = joins.mean(axis=0).astype(np.float32)
    std_j = np.maximum(joins.std(axis=0), 1e-8).astype(np.float32)

    wave_offset = 0
    utt_offset = 0
    cuts, utts, waves, wave_offsets, filenames = [], [], [], [0], []
    voice_ids = []
    for vi, db in enumerate(dbs):
        cuts.append(db.cutpoints + wave_offset)
        utts.append(db.utt_index + utt_offset)
        waves.append(np.asarray(db.waves, np.float32))
        offs = np.asarray(db.wave_offsets[1:]) + wave_offset
        wave_offsets.extend(offs.tolist())
        filenames.extend(f"{names[vi]}/{fn}" for fn in db.filenames)
        voice_ids.append(np.full(db.n_units, vi, np.int32))
        wave_offset += len(db.waves)
        utt_offset += len(db.filenames)

    return VoiceDB(
        sample_rate=base.sample_rate,
        target_representation=base.target_representation,
        multiepoch=base.multiepoch,
        stream_list=list(base.stream_list),
        datadims=dict(base.datadims),
        filenames=filenames,
        unit_names=list(names),            # voice-id vocabulary
        phone_names=[],
        unit_features=feats,
        join_left=np.concatenate([db.join_left for db in dbs]),
        join_right=np.concatenate([db.join_right for db in dbs]),
        cutpoints=np.concatenate(cuts),
        utt_index=np.concatenate(utts),
        unit_pos=np.concatenate([db.unit_pos for db in dbs]),
        unit_code=np.concatenate(voice_ids),     # voice id per unit
        context_codes=np.zeros((len(feats), 5), np.int32),
        unit_lf0=np.concatenate([db.unit_lf0 for db in dbs]),
        mean_target=mean_t,
        std_target=std_t,
        mean_join=mean_j,
        std_join=std_j,
        waves=np.concatenate(waves),
        wave_offsets=np.asarray(wave_offsets, np.int64),
    )
