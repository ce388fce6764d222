"""Synthesiser: the runtime core.

Role-equivalent of the reference's ``class Synthesiser`` in
script/synth_halfphone.py (SURVEY.md §2 row 2, §3.2; unverified, mount
empty): load voice DB -> preselect -> Viterbi -> concatenate -> wav.

TPU-first design: the whole per-utterance pipeline
(preselect top-k over the DB, candidate gather, target costs, Viterbi scan,
cutpoint gather, crossfade OLA) is ONE jitted program per (T-bucket) shape,
compiled once and reused.  Utterances are padded to a small set of length
buckets (SURVEY.md §7 hard part (c)); batching is a vmap over the utterance
axis.  The unit DB lives on device permanently (HBM resident).
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from snickery_tpu import utils
from snickery_tpu.config import SnickeryConfig
from snickery_tpu.ops.ola import host_overlap_add, overlap_add_units
from snickery_tpu.ops.topk import (halfphone_exact_rank,
                                   halfphone_lattice_mask,
                                   order_topk_positions, preselect_margin,
                                   topk_preselect, zero_transient_default)
from snickery_tpu.ops.viterbi import viterbi_decode, greedy_decode
from snickery_tpu.voicedb.db import VoiceDB
from snickery_tpu.voicedb.device_layout import (affine_rows, build_raw_blocks,
                                                gather_join_contexts)

# Strict back-off preselection tiers (preselection_method="quinphone_backoff"):
# one outer-context (quinphone) mismatch costs 2^14, one inner-context
# (triphone) mismatch costs 256 * 2^14 = 2^22.  Powers of two are exact in
# f32 and the gaps dominate any acoustic score (squared weighted distances
# span a few thousand at most on normalised features), so candidate pools
# tier strictly: exact quinphone > triphone-only > same-halfphone-only,
# with exact acoustic ordering inside each tier (f32 ulp at 2^22+2^15 is
# 0.25 — fine-grained against real score gaps).
BACKOFF_LING_WEIGHTS = (1.0, 256.0, 0.0, 256.0, 1.0, 16384.0)

logger = utils.logger


def _stream_weight_vector(cfg: SnickeryConfig, weights: list[float]) -> np.ndarray:
    """Per-dimension weight vector (d,) from per-stream weights."""
    out = np.zeros(cfg.target_dim, np.float32)
    for (name, a, b), w in zip(cfg.stream_slices, weights):
        out[a:b] = w
    return out


class DeviceDB(NamedTuple):
    """HBM-resident voice DB arrays, passed as explicit jit arguments.

    IMPORTANT: these must be *arguments* of the jitted pipeline, never
    closure captures — closed-over device arrays are baked into the HLO as
    constants, which defeats JAX's persistent compilation cache and makes
    every process pay the (minutes-long, remote-compile) pipeline build.
    """
    raw: jax.Array          # (q, D+1) RAW unit feature block + jr-exception
                            # pointer column (voicedb.device_layout): rows
                            # [0, Mp) raw target features, row Mp a zero
                            # halo, tail rows the irregular join_right rows.
                            # The preselect operand AND both join contexts
                            # are derived from this ONE array on device —
                            # 3x less upload + HBM than shipping the
                            # normalised feats + concatenated jl|jr (epoch
                            # mode; 2x at multiepoch=2).  Join-context
                            # gathers keep the old cost: the exact-rescore
                            # gather already fetches each candidate's raw
                            # row (cols [:dj] ARE join_left, col D the
                            # pointer), and jr is one gather at
                            # ``raw[ptr > 0 ? ptr : idx + 1]`` — row-gather
                            # cost is per-row overhead-bound on this
                            # hardware (2M rows ~ 52 ms, bytes ~ 3 ms), and
                            # the row count is unchanged.
    n_real: jax.Array       # scalar int32: rows >= n_real are padding
    cut1: jax.Array         # (Mp,)
    cut2: jax.Array         # (Mp,)
    waves: jax.Array        # (S,) f32, or int16 (config waves_dtype)
    wave_scale: jax.Array   # scalar f32: audio = waves * wave_scale
    mean_t: jax.Array       # (D,)  target-feature normalisation + weighting
    std_t: jax.Array        # (D,)
    sqrt_wt: jax.Array      # (D,)
    mean_j: jax.Array       # (dj,) join-context normalisation + weighting
    std_j: jax.Array        # (dj,)
    sqrt_wj: jax.Array      # (dj,)
    codes: jax.Array        # (Mp,)  halfphone codes (zeros in epoch mode)
    ctx: jax.Array          # (Mp, 5) quinphone codes
    vids: jax.Array         # (Mp,)  voice ids (zeros for single-voice DBs)


@functools.partial(
    jax.jit,
    static_argnames=("n_cand", "chunk", "greedy", "halfphone",
                     "max_frag", "out_len", "taper", "use_pallas",
                     "mm_precision", "multivoice", "ling_weights",
                     "pallas_interpret", "squared_joins", "do_ola",
                     "margin", "zero_transient"),
)
def synth_pipeline_step(
    db: DeviceDB,
    targets: jax.Array,      # (T, D) raw unit-rate target features
    length: jax.Array,       # scalar int32 — live steps
    tgt_codes: jax.Array,    # (T,) halfphone codes (halfphone) / unused
    tgt_ctx: jax.Array,      # (T, 5)
    tgt_vids: jax.Array,     # (T,) requested voice id per step (multivoice)
    jcw: jax.Array,          # scalar join_cost_weight
    eps: jax.Array,          # scalar search_epsilon
    *,
    n_cand: int,
    chunk: int,
    greedy: bool,
    halfphone: bool,
    max_frag: int,
    out_len: int,
    taper: int,
    use_pallas: bool = False,
    mm_precision: str = "highest",
    multivoice: bool = False,
    ling_weights: tuple | None = None,
    pallas_interpret: bool = False,
    squared_joins: bool = False,
    do_ola: bool = True,
    margin: int = -1,        # preselect rank margin (-1 = auto policy)
    zero_transient: int = -1,  # -1 = auto policy, 0 = off, 1 = on
):
    """The full per-utterance synthesis program (one compiled unit).

    ``multivoice``: ``tgt_vids`` carry the requested voice id per step and
    ``db.vids`` the per-unit voice id; selection is hard-restricted to the
    matching voice via the fused partition mask (composes with the
    halfphone linguistic penalties).
    ``do_ola=False`` (config preload_all_waves=False): the corpus audio is
    NOT device-resident — skip concatenation, return a placeholder audio
    buffer plus the exact total sample count; the caller overlap-adds on
    host from the mmap'd corpus."""
    T = targets.shape[0]
    kd = db.sqrt_wt.shape[0]
    # padded DB unit count: db.raw rows [0, m_pad) are the DB, the tail the
    # jr-exception block (voicedb.device_layout); cut1 has exactly Mp rows
    m_pad = db.cut1.shape[0]
    dj = db.sqrt_wj.shape[0]
    aff = (db.mean_t, db.std_t, db.sqrt_wt, db.n_real)
    tnorm = (targets - db.mean_t[None, :]) / db.std_t[None, :]
    tw = tnorm * db.sqrt_wt[None, :]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    live = t_idx < length
    tw = jnp.where(live[:, None], tw, 0.0)

    ling = (tgt_codes, tgt_ctx, db.codes, db.ctx) if halfphone else None
    part = (tgt_vids, db.vids) if multivoice else None
    # rank margin under approximate kernel precisions: preselect k+margin,
    # keep the exact top-k after rescoring below (ops.topk.preselect_margin)
    # zero-transient mode: the kernel consumes the resident raw block
    # directly (affine folded into prescaled targets, ops.pallas_topk) —
    # no per-step derived DB operand in HBM (ops.topk.zero_transient_default
    # for the policy + the measured split3cat verdict).
    zt = (zero_transient_default(use_pallas, mm_precision)
          if zero_transient < 0 else bool(use_pallas and zero_transient))
    k_sel = min(n_cand + preselect_margin(use_pallas, mm_precision, halfphone,
                                          zero_transient=zt, override=margin),
                m_pad)
    if use_pallas:
        from snickery_tpu.ops.pallas_topk import pallas_topk_preselect
        cand_idx, scores = pallas_topk_preselect(
            tw, db.raw if zt else db.raw[:m_pad, :kd], k=k_sel,
            mm_precision=mm_precision,
            sort=False, partition=part, linguistic=ling,
            ling_weights=ling_weights, interpret=pallas_interpret,
            db_affine=aff, zero_transient=zt, m_rows=m_pad if zt else None)
    else:
        cand_idx, scores = topk_preselect(
            tw, db.raw[:m_pad, :kd], k=n_cand, chunk=chunk, linguistic=ling,
            partition=part, ling_weights=ling_weights, db_affine=aff)
    # exact f32 rescoring of the k winners + canonical (score, unit-id)
    # order: the kernel may RANK with bf16-split matmuls, but the cost
    # lattice must see exact distances, and Viterbi breaks exact ties by
    # candidate position so the order must match the float64 oracle's
    # (value, index) convention (see parallel/sharded.py for the measured
    # agreement impact of each).  Halfphone mode re-ranks by the exact-f32
    # (squared distance + linguistic penalty) key (ops.topk.
    # halfphone_exact_rank); epoch mode by the exact distance itself.
    rows_c = db.raw[cand_idx]                                   # (T,N,kd+1)
    valid_c = cand_idx < db.n_real
    cand_feats = affine_rows(rows_c[..., :kd], db.mean_t, db.std_t,
                             db.sqrt_wt, valid_c, 1e6)          # (T,N,D)
    diff = cand_feats - tw[:, None, :]
    sq_exact = jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
    ac = jnp.sqrt(sq_exact)
    ac = jnp.where(jnp.isinf(scores), jnp.inf, ac)
    if halfphone:
        mism = db.codes[cand_idx] != tgt_codes[:, None]
        rank = halfphone_exact_rank(sq_exact, scores, mism,
                                    db.ctx[cand_idx], tgt_ctx, ling_weights)
        # Identity fallback rule in the LATTICE costs, in MASK form:
        # preselect slots left over after the same-name pool is exhausted
        # (small voices / rare halfphones) are filled by other units, which
        # must only ever win when no same-name candidate exists at that
        # step — not on acoustics alone.  Context (quinphone) penalties
        # stay preselect-only, as in the reference's linguistic
        # preselection (SURVEY.md §2 row 3: matching decides the pool, not
        # the target cost).  oracle.synth_pipeline applies the same rule;
        # see halfphone_lattice_mask for the f32-precision rationale.
        ac = halfphone_lattice_mask(ac, mism)
    else:
        rank = ac
    order = order_topk_positions(rank, cand_idx, n_cand)
    cand_idx = jnp.take_along_axis(cand_idx, order, axis=-1)
    target_costs = jnp.take_along_axis(ac, order, axis=-1)
    target_costs = jnp.where(live[:, None], target_costs, 0.0)

    rows_sel = jnp.take_along_axis(rows_c, order[:, :, None], axis=1)
    jl_cand, jr_cand = gather_join_contexts(
        rows_sel, db.raw, cand_idx, dj,
        db.mean_j, db.std_j, db.sqrt_wj, cand_idx < db.n_real)
    if greedy:
        path, total_cost = greedy_decode(
            target_costs, jl_cand, jr_cand, join_cost_weight=jcw, length=length,
            squared_joins=squared_joins)
    else:
        path, total_cost = viterbi_decode(
            target_costs, jl_cand, jr_cand, join_cost_weight=jcw,
            search_epsilon=eps, length=length, squared_joins=squared_joins)
    unit_ids = jnp.take_along_axis(cand_idx, path[:, None], axis=1)[:, 0]
    unit_ids = jnp.where(live, unit_ids, 0)

    if do_ola:
        audio, total_samples = overlap_add_units(
            db.waves, db.cut1[unit_ids], db.cut2[unit_ids], n_units=length,
            max_frag=max_frag, out_len=out_len, taper=taper,
            wave_scale=db.wave_scale)
    else:
        spans = jnp.where(live, db.cut2[unit_ids] - db.cut1[unit_ids], 0)
        total_samples = 2 * taper + jnp.sum(spans)
        audio = jnp.zeros((8,), jnp.float32)
    return unit_ids, total_cost, audio, total_samples


@functools.partial(jax.jit, static_argnames=(
    "n_cand", "chunk", "use_pallas", "mm_precision", "multivoice",
    "max_frag", "out_len", "taper", "pallas_interpret", "squared_joins",
    "do_ola", "margin", "zero_transient"))
def _streaming_step(
    db: DeviceDB,
    targets: jax.Array,      # (T, D) unit-rate targets (padded)
    length: jax.Array,       # scalar int32
    tgt_codes: jax.Array,    # (T,) voice id per step (multi-voice DBs)
    init_ctx: jax.Array,     # (dj,) running join context from previous chunk
    jcw_first: jax.Array,    # join weight for the first step (0 at stream start)
    jcw_rest: jax.Array,     # join weight once a context exists
    *,
    n_cand: int,
    chunk: int,
    use_pallas: bool,
    mm_precision: str,
    multivoice: bool,
    max_frag: int,
    out_len: int,
    taper: int,
    pallas_interpret: bool = False,
    squared_joins: bool = False,
    do_ola: bool = True,
    margin: int = -1,
    zero_transient: int = -1,
):
    """One streaming-decode step, fully on device: preselect + greedy decode
    with an incoming join context + chunk OLA.  Returns (unit ids (T,),
    outgoing context (dj,), audio (out_len,), total_samples scalar).

    The audio covers this chunk's units *including* their leading and
    trailing tapers; the caller crossfades consecutive chunks by summing the
    trailing 2*taper samples into the next chunk's head (identical maths to
    one whole-utterance OLA because the ramps are complementary)."""
    T = targets.shape[0]
    kd = db.sqrt_wt.shape[0]
    dj = db.sqrt_wj.shape[0]
    m_pad = db.cut1.shape[0]
    aff = (db.mean_t, db.std_t, db.sqrt_wt, db.n_real)
    tnorm = (targets - db.mean_t[None, :]) / db.std_t[None, :]
    tw = tnorm * db.sqrt_wt[None, :]
    live = jnp.arange(T, dtype=jnp.int32) < length
    tw = jnp.where(live[:, None], tw, 0.0)
    part = (tgt_codes, db.vids) if multivoice else None
    zt = (zero_transient_default(use_pallas, mm_precision)
          if zero_transient < 0 else bool(use_pallas and zero_transient))
    k_sel = min(n_cand + preselect_margin(use_pallas, mm_precision,
                                          zero_transient=zt, override=margin),
                m_pad)
    if use_pallas:
        from snickery_tpu.ops.pallas_topk import pallas_topk_preselect
        cand_idx, scores = pallas_topk_preselect(
            tw, db.raw if zt else db.raw[:m_pad, :kd], k=k_sel,
            mm_precision=mm_precision,
            sort=False, partition=part, interpret=pallas_interpret,
            db_affine=aff, zero_transient=zt, m_rows=m_pad if zt else None)
    else:
        cand_idx, scores = topk_preselect(
            tw, db.raw[:m_pad, :kd], k=n_cand, chunk=chunk, partition=part,
            db_affine=aff)
    # exact f32 rescoring + canonical (score, unit-id) order — same
    # rationale as synth_pipeline_step (lattice costs must be exact f32,
    # tie-break order must match the oracle's convention)
    rows_c = db.raw[cand_idx]
    cand_feats = affine_rows(rows_c[..., :kd], db.mean_t, db.std_t,
                             db.sqrt_wt, cand_idx < db.n_real, 1e6)
    diff = cand_feats - tw[:, None, :]
    ac = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    ac = jnp.where(jnp.isinf(scores), jnp.inf, ac)
    order = order_topk_positions(ac, cand_idx, n_cand)
    cand_idx = jnp.take_along_axis(cand_idx, order, axis=-1)
    target_costs = jnp.where(
        live[:, None], jnp.take_along_axis(ac, order, axis=-1), 0.0)
    rows_sel = jnp.take_along_axis(rows_c, order[:, :, None], axis=1)
    jl_cand, jr_cand = gather_join_contexts(
        rows_sel, db.raw, cand_idx, dj,
        db.mean_j, db.std_j, db.sqrt_wj, cand_idx < db.n_real)

    def step(carry, inp):
        ctx, w = carry
        tc_t, jl_t, jr_t, live_t = inp
        dist = jnp.maximum(jnp.sum((jl_t - ctx[None, :]) ** 2, axis=-1), 0.0)
        if not squared_joins:
            dist = jnp.sqrt(dist)
        total = tc_t + jnp.where(live_t, w * dist, 0.0)
        choice = jnp.argmin(total).astype(jnp.int32)
        new_ctx = jnp.where(live_t, jr_t[choice], ctx)
        new_w = jnp.where(live_t, jcw_rest, w)   # context exists from now on
        return (new_ctx, new_w), choice

    (ctx_out, _), path = jax.lax.scan(
        step, (init_ctx, jcw_first), (target_costs, jl_cand, jr_cand, live))
    unit_ids = jnp.take_along_axis(cand_idx, path[:, None], axis=1)[:, 0]
    unit_ids = jnp.where(live, unit_ids, 0)
    if do_ola:
        audio, total = overlap_add_units(
            db.waves, db.cut1[unit_ids], db.cut2[unit_ids], n_units=length,
            max_frag=max_frag, out_len=out_len, taper=taper,
            wave_scale=db.wave_scale)
    else:
        spans = jnp.where(live, db.cut2[unit_ids] - db.cut1[unit_ids], 0)
        total = 2 * taper + jnp.sum(spans)
        audio = jnp.zeros((8,), jnp.float32)
    return unit_ids, ctx_out, audio, total


class Synthesiser:
    """Loads a VoiceDB and synthesises utterances on TPU.

    Mirrors the reference Synthesiser's lifecycle: heavy setup in
    ``__init__`` (device upload replacing the KD-tree build), then cheap
    per-utterance ``synth_utt``/``synth_batch`` calls.
    """

    def __init__(self, cfg: SnickeryConfig, db: VoiceDB | None = None):
        self.cfg = cfg
        self.timer = utils.StageTimer()
        with self.timer.stage("load_db"):
            self.db = db if db is not None else VoiceDB.load(cfg.db_path)
        db = self.db
        if db.target_representation != cfg.target_representation:
            logger.warning(
                "config target_representation=%s but DB is %s; using DB's",
                cfg.target_representation, db.target_representation)
        self.frames_per_unit = 3 if db.target_representation == "halfphone" else db.multiepoch

        with self.timer.stage("prepare_db"):
            self._prepare_device_db()

    # ------------------------------------------------------------------ setup
    def _prepare_device_db(self) -> None:
        cfg, db = self.cfg, self.db
        # fire the tiny session-warmup transfer FIRST: its 49-210 s axon
        # tunnel stall (utils.warm_transfer) runs concurrently with all the
        # host-side feature prep below
        utils.warm_transfer()
        d = cfg.target_dim
        k = self.frames_per_unit

        # per-dim weights; target features stack k frames -> tile weights
        w_t = np.tile(_stream_weight_vector(cfg, cfg.target_stream_weights), k)
        if db.join_dim % d != 0:
            raise ValueError(
                f"DB join dim {db.join_dim} is not a multiple of stream dim {d}")
        # join contexts span join_context_frames frames (DB-derived: the DB
        # was built with some jcf and its join_dim records it)
        w_j = np.tile(_stream_weight_vector(cfg, cfg.join_stream_weights),
                      db.join_dim // d)
        if db.target_dim != k * d:
            raise ValueError(
                f"DB target dim {db.target_dim} != frames_per_unit {k} * stream dim {d}")
        self._sqrt_wt = np.sqrt(w_t).astype(np.float32)
        self._sqrt_wj = np.sqrt(w_j).astype(np.float32)

        m = db.n_units
        from snickery_tpu.ops.pallas_topk import CHUNK as _P_CHUNK
        import math
        self.chunk = (8192 if m >= 8192
                      else utils.next_multiple(m, cfg.db_pad_multiple))
        # rows must divide both the XLA scan chunk and the pallas kernel
        # CHUNK — and with a sharded DB every per-shard slice must too, so
        # the pallas pad unit scales by mesh_db
        pad_unit = (math.lcm(self.chunk, _P_CHUNK * max(1, cfg.mesh_db))
                    if cfg.use_pallas else self.chunk)
        mp = utils.next_multiple(m, pad_unit)
        self.n_units = m
        self.n_units_padded = mp

        # ONE raw block instead of normalised feats + concatenated jl|jr:
        # 3x less upload + HBM at epoch voices (voicedb.device_layout) —
        # normalisation/weighting and both join contexts are derived on
        # device from this array.  join_left == the unit's own first raw
        # frame by builder construction (voicedb/build.py); verified so a
        # foreign DB can never silently decode with wrong join contexts.
        if not np.array_equal(db.join_left, db.unit_features[:, :db.join_dim]):
            raise ValueError(
                "VoiceDB violates join_left == unit_features[:, :d_join]; "
                "the device layout derives join contexts from the raw rows")
        raw_block, _, _ = build_raw_blocks(
            db.unit_features, db.join_right, mp, ndb=1,
            affine=(db.mean_target, db.std_target, self._sqrt_wt))
        cuts = np.pad(db.cutpoints.astype(np.int32), ((0, mp - m), (0, 0)))

        # fail fast on an inconsistent preselection method (the resolver
        # raises for linguistic modes on non-halfphone voices)
        self._preselect_method()

        dev = jax.devices()[0]
        # chunked upload: ~5x monolithic throughput on the axon tunnel and
        # keeps signal handlers responsive during multi-GB transfers
        put = functools.partial(utils.chunked_device_put, device=dev)
        raw_fmt = (utils.colmajor_format(dev)
                   if self._raw_colmajor(mp, db.target_dim) else None)
        # merged multi-voice DBs carry voice_ids + voice_names (voicedb/multivoice.py)
        self.is_multivoice = db.is_multivoice
        if self.is_multivoice:
            # Partition-restricted preselect contract: a voice with fewer
            # live units than n_candidates leaves (inf, unit 0) slots in the
            # candidate state, which would silently degenerate the Viterbi
            # path (ADVICE.md round 1) — reject such DBs up front.
            counts = np.bincount(db.voice_ids, minlength=len(db.voice_names))
            short = [db.voice_names[v] for v in np.nonzero(
                counts < cfg.n_candidates)[0]]
            if short:
                raise ValueError(
                    f"multi-voice DB: voices {short} have fewer than "
                    f"n_candidates={cfg.n_candidates} units; selection for "
                    "them would be degenerate")
        if db.target_representation == "halfphone":
            codes_arr = np.pad(db.unit_code.astype(np.int32), (0, mp - m),
                               constant_values=-1)
            ctx_arr = np.pad(db.context_codes.astype(np.int32),
                             ((0, mp - m), (0, 0)), constant_values=-1)
        else:
            codes_arr = np.zeros(mp, np.int32)
            ctx_arr = np.zeros((mp, 5), np.int32)
        vids_arr = np.pad(db.voice_ids.astype(np.int32), (0, mp - m),
                          constant_values=-1)
        # preload_all_waves=False keeps the corpus audio on host (the VoiceDB
        # loads it mmap-backed); the device sees a tiny placeholder and the
        # OLA runs in numpy after decode (ops.ola.host_overlap_add).
        # waves_dtype="int16" quantises at the corpus peak (halves the one
        # replicated array's HBM; ~96 dB SNR).
        wave_scale = np.float32(1.0)
        if not cfg.preload_all_waves:
            waves_dev = np.zeros(128, np.float32)
        elif cfg.waves_dtype == "int16":
            w32 = np.asarray(db.waves, np.float32)
            peak = float(np.abs(w32).max()) if len(w32) else 1.0
            wave_scale = np.float32(max(peak, 1e-9) / 32767.0)
            waves_dev = np.clip(np.round(w32 / wave_scale),
                                -32768, 32767).astype(np.int16)
        else:
            waves_dev = np.asarray(db.waves, np.float32)
        self.device_db = DeviceDB(
            raw=put(raw_block, format=raw_fmt),
            n_real=put(np.int32(m)),
            cut1=put(np.ascontiguousarray(cuts[:, 1])),
            cut2=put(np.ascontiguousarray(cuts[:, 2])),
            waves=put(waves_dev),
            wave_scale=put(wave_scale),
            mean_t=put(db.mean_target.astype(np.float32)),
            std_t=put(db.std_target.astype(np.float32)),
            sqrt_wt=put(self._sqrt_wt),
            mean_j=put(db.mean_join.astype(np.float32)),
            std_j=put(db.std_join.astype(np.float32)),
            sqrt_wj=put(self._sqrt_wj),
            codes=put(codes_arr),
            ctx=put(ctx_arr),
            vids=put(vids_arr),
        )
        self.d_lf0 = put(np.pad(db.unit_lf0.astype(np.float32), ((0, mp - m), (0, 0))))
        # static OLA geometry
        spans = (db.cutpoints[:, 2] - db.cutpoints[:, 1]).astype(np.int64)
        self.max_span = int(spans.max()) if len(spans) else 1
        self.max_frag = utils.next_multiple(self.max_span + 2 * cfg.taper_length, 128)
        self._unit_vocab = {n: i for i, n in enumerate(db.unit_names)}
        self._phone_vocab = {n: i for i, n in enumerate(db.phone_names)}
        self._voice_vocab = {n: i for i, n in enumerate(db.voice_names)}
        self._mesh = None
        self._sharded_voice = None

    # ------------------------------------------------------- target assembly
    def targets_from_features(self, features: np.ndarray) -> tuple[np.ndarray, int]:
        """Group an epoch-rate feature trajectory (T_epochs, d) into unit-rate
        target vectors (T_units, k*d) matching the DB unit features.

        The unit grid starts at centre epoch 1 and ends at E-2 (voicedb/build
        cuts units with one epoch of context each side), so the target grid
        does the same — a natural target then selects the natural unit
        sequence exactly.
        """
        k = self.frames_per_unit
        d = self.cfg.target_dim
        if features.shape[1] != d:
            raise ValueError(f"feature dim {features.shape[1]} != {d}")
        usable = features[1: len(features) - 1]
        t_units = len(usable) // k
        if t_units == 0:
            raise ValueError("utterance shorter than one unit")
        return usable[: t_units * k].reshape(t_units, k * d).astype(np.float32), t_units

    # --------------------------------------------------------------- pipeline
    def _use_pallas(self) -> bool:
        # cfg.use_pallas may be True/False or the string "interpret": the
        # latter forces the Pallas path in interpret mode on ANY backend so
        # CPU test runs exercise the real kernel code (slow; tests only)
        import jax as _jax
        if self.cfg.use_pallas == "interpret":
            return True
        return (bool(self.cfg.use_pallas)
                and _jax.default_backend() not in ("cpu",))

    def _pallas_interpret(self) -> bool:
        return self.cfg.use_pallas == "interpret"

    def _raw_colmajor(self, mp: int, kd: int) -> bool:
        """Should the resident raw block live in COLUMN-MAJOR device layout?

        The default row-major tiled layout lane-pads the (mp, kd+1) block's
        minor dim to a multiple of 128 (152 -> 256 at d=151), and the
        compiled step then materialises a relayout COPY of the whole block
        every execution — 1.7x the block's size, 8 GiB at 8.4M units (the
        round-4 capacity OOM; commit a155ec4's open half).  Column-major
        is compact for the same array (kd+1 along sublanes, mp % 128 == 0
        along lanes), so the zero-transient kernel reads the resident
        block directly with no copy; bit-identical through the production
        step (scripts/exp_layout.py, scripts/exp_layout_full.py).

        "auto" flips to colmajor only where the copy is material
        (>= 2 GiB) and the zero-transient Pallas path consumes the
        resident block; "colmajor"/"rowmajor" force it either way.
        """
        mode = self.cfg.raw_block_layout
        if mode == "rowmajor":
            return False
        if mode == "colmajor":
            return True
        if not self._use_pallas():
            return False
        zt = (zero_transient_default(True, self.cfg.preselect_precision)
              if self.cfg.zero_transient < 0
              else bool(self.cfg.zero_transient))
        if not zt:
            return False
        lanes = -(-(kd + 1) // 128) * 128
        return mp * lanes * 4 >= (2 << 30)

    def _preselect_method(self) -> str:
        """Resolve config preselection_method ("" = auto by voice type)."""
        m = self.cfg.preselection_method
        halfphone = self.db.target_representation == "halfphone"
        if not m:
            return "quinphone" if halfphone else "acoustic"
        if m != "acoustic" and not halfphone:
            raise ValueError(
                f"preselection_method={m!r} needs a halfphone voice "
                f"(this DB has target_representation="
                f"{self.db.target_representation!r})")
        return m

    def _use_ling(self) -> bool:
        """Whether linguistic (quinphone) penalties enter the preselect."""
        return self._preselect_method() in ("quinphone", "quinphone_backoff")

    def _ling_weights(self) -> tuple:
        cfg = self.cfg
        if self._preselect_method() == "quinphone_backoff":
            return BACKOFF_LING_WEIGHTS
        return tuple(float(w) for w in cfg.quinphone_context_weights) + (
            float(cfg.quinphone_penalty_scale),)

    def _host_ola(self, unit_ids: np.ndarray) -> np.ndarray:
        """Host-side concatenation for preload_all_waves=False."""
        cuts = self.db.cutpoints
        ids = np.asarray(unit_ids)
        return host_overlap_add(
            np.asarray(self.db.waves), cuts[ids, 1], cuts[ids, 2],
            self.cfg.taper_length)

    def _run_pipeline(self, tgt_pad, t_units, codes, ctx, vids,
                      n_cand: int, greedy: bool):
        cfg = self.cfg
        use_pallas = self._use_pallas()
        if use_pallas:
            from snickery_tpu.ops.pallas_topk import T_TILE
            t_bucket = utils.next_multiple(tgt_pad.shape[0], T_TILE)
            pad = t_bucket - tgt_pad.shape[0]
            if pad:
                tgt_pad = np.pad(tgt_pad, ((0, pad), (0, 0)))
                codes = np.pad(codes, (0, pad), constant_values=-1)
                ctx = np.pad(ctx, ((0, pad), (0, 0)), constant_values=-1)
                vids = np.pad(vids, (0, pad), constant_values=-1)
        t_bucket = tgt_pad.shape[0]
        out_len = utils.next_multiple(
            t_bucket * self.max_span + 2 * cfg.taper_length, 128)
        return synth_pipeline_step(
            self.device_db,
            jnp.asarray(tgt_pad), jnp.int32(t_units),
            jnp.asarray(codes), jnp.asarray(ctx), jnp.asarray(vids),
            jnp.float32(cfg.join_cost_weight), jnp.float32(cfg.search_epsilon),
            n_cand=n_cand, chunk=self.chunk, greedy=greedy,
            halfphone=self._use_ling(),
            max_frag=self.max_frag, out_len=out_len, taper=cfg.taper_length,
            use_pallas=use_pallas, mm_precision=cfg.preselect_precision,
            multivoice=self.is_multivoice,
            ling_weights=self._ling_weights(),
            pallas_interpret=self._pallas_interpret(),
            squared_joins=cfg.join_cost_type == "squared",
            do_ola=cfg.preload_all_waves,
            margin=cfg.preselect_margin, zero_transient=cfg.zero_transient,
        )

    # ----------------------------------------------------------------- public
    def _voice_code(self, voice) -> int:
        if isinstance(voice, str):
            if voice not in self._voice_vocab:
                raise KeyError(f"unknown voice {voice!r}; have {self.db.voice_names}")
            return self._voice_vocab[voice]
        return int(voice)

    def synth_from_features(
        self,
        features: np.ndarray,
        greedy: bool | None = None,
        target_segments: list | None = None,
        voice=None,
    ) -> dict:
        """Synthesise one utterance from an epoch-rate target trajectory.

        Returns dict(wave, unit_ids, total_cost, n_units).
        ``target_segments`` (halfphone mode): list of HalfphoneSegment giving
        the unit names/contexts of the target — in that mode ``features``
        must already be at unit rate (T_units, 3*d) via
        ``halfphone_targets_from_features``.
        ``voice`` (multi-voice DBs): name or id of the voice to select from
        (required when the DB was built by merge_voicedbs).
        """
        cfg = self.cfg
        greedy = cfg.greedy_search if greedy is None else greedy
        halfphone = self.db.target_representation == "halfphone"
        if self.is_multivoice and voice is None:
            raise ValueError(
                "this is a multi-voice DB: pass voice=<name or id> "
                f"(available: {self.db.voice_names})")
        vid = self._voice_code(voice) if self.is_multivoice else 0

        if halfphone:
            if target_segments is None:
                raise ValueError("halfphone mode needs target_segments")
            tgt_units = np.asarray(features, np.float32)
            t_units = len(tgt_units)
            codes = np.asarray(
                [self._unit_vocab.get(s.name, -1) for s in target_segments], np.int32)
            ctx = np.asarray(
                [[self._phone_vocab.get(p, 0) for p in s.quinphone]
                 for s in target_segments], np.int32)
        else:
            tgt_units, t_units = self.targets_from_features(features)
            codes = np.zeros(t_units, np.int32)
            ctx = np.zeros((t_units, 5), np.int32)
        vids = np.full(t_units, vid, np.int32)

        t_bucket = utils.bucket_length(t_units, tuple(cfg.length_buckets))
        pad = t_bucket - t_units
        tgt_pad = np.pad(tgt_units, ((0, pad), (0, 0)))
        codes = np.pad(codes, (0, pad), constant_values=-1)
        ctx = np.pad(ctx, ((0, pad), (0, 0)), constant_values=-1)
        vids = np.pad(vids, (0, pad), constant_values=-1)

        n_cand = min(cfg.n_candidates, self.n_units_padded)
        with self.timer.stage("synth_step"):
            unit_ids, total_cost, audio, total_samples = jax.device_get(
                self._run_pipeline(tgt_pad, t_units, codes, ctx, vids,
                                   n_cand, greedy))
        unit_ids = np.asarray(unit_ids[:t_units])
        wave = (np.asarray(audio[: int(total_samples)])
                if cfg.preload_all_waves else self._host_ola(unit_ids))
        return {
            "wave": wave,
            "unit_ids": unit_ids,
            "total_cost": float(total_cost),
            "n_units": int(t_units),
        }

    def ensure_sharded(self) -> None:
        """Create the (data x db) mesh + sharded voice placement if needed.

        Called lazily by ``synth_batch``; callers driving
        ``parallel.batched_synth_step`` directly (bench.py) call it first
        and then use ``self._mesh`` / ``self._sharded_voice``.
        """
        if self._mesh is not None:
            return
        from snickery_tpu.parallel import make_mesh, shard_voice
        cfg = self.cfg
        n_mesh = max(1, cfg.mesh_data) * max(1, cfg.mesh_db)
        devices = (jax.devices()[:n_mesh] if n_mesh > 1
                   else [jax.devices()[0]])
        self._mesh = make_mesh(cfg.mesh_data, max(1, cfg.mesh_db),
                               devices=devices)
        ddb = self.device_db
        ndb = max(1, cfg.mesh_db)
        if ndb == 1:
            # the DeviceDB raw block IS the 1-shard layout: alias it
            # (device_put with identical placement copies nothing)
            raw_block = ddb.raw
        else:
            # shard-local blocks (local jr-exception pointers + halo
            # per shard) — rebuilt host-side for this mesh
            raw_block, _, _ = build_raw_blocks(
                self.db.unit_features, self.db.join_right,
                self.n_units_padded, ndb=ndb,
                affine=(self.db.mean_target, self.db.std_target,
                        self._sqrt_wt))
        # codes/ctx/part are passed unconditionally: for voices that do
        # not use them they are all-zero arrays, identical to the
        # defaults shard_voice would create
        self._sharded_voice = shard_voice(
            self._mesh, raw_block, ddb.cut1, ddb.cut2,
            ddb.waves, ddb.mean_t, ddb.std_t, ddb.sqrt_wt,
            ddb.mean_j, ddb.std_j, ddb.sqrt_wj, n_real=ddb.n_real,
            part=ddb.vids, codes=ddb.codes, ctx=ddb.ctx,
            wave_scale=ddb.wave_scale)

    def synth_batch(self, feature_list: list[np.ndarray], greedy: bool = False,
                    voices: list | None = None,
                    segments_list: list | None = None) -> list[dict]:
        """Batched multi-utterance synthesis in one device step.

        Pads all utterances to a shared T bucket and runs the sharded batch
        step over a (mesh_data x mesh_db) mesh from the config (1x1 by
        default — the same compiled program scales to multi-chip meshes; see
        snickery_tpu.parallel).  ``voices``: per-utterance voice name/id for
        multi-voice DBs.  ``segments_list`` (halfphone mode): one list of
        HalfphoneSegment per utterance; ``feature_list`` entries must then
        already be unit-rate (from ``halfphone_targets_from_features``).
        Returns one result dict per utterance, identical in content to
        ``synth_from_features``.
        """
        from snickery_tpu.parallel import batched_synth_step, make_mesh, shard_voice

        cfg = self.cfg
        halfphone = self.db.target_representation == "halfphone"
        if self.is_multivoice and voices is None:
            raise ValueError(
                "multi-voice DB: pass voices=[...] (one per utterance)")
        if halfphone:
            if segments_list is None:
                raise ValueError("halfphone mode needs segments_list")
            prepped = [(np.asarray(f, np.float32), len(f)) for f in feature_list]
        else:
            prepped = [self.targets_from_features(f) for f in feature_list]
        t_max = max(n for _, n in prepped)
        t_bucket = utils.bucket_length(t_max, tuple(cfg.length_buckets))
        # the sharded step splits the batch across the WHOLE mesh (each
        # device decodes B/(mesh_data*mesh_db) utterances), so pad the batch
        # with zero-length dummies up to a mesh multiple
        B0 = len(prepped)
        mesh_mult = max(1, cfg.mesh_data) * max(1, cfg.mesh_db)
        B = B0 + (-B0) % mesh_mult
        tgts = np.zeros((B, t_bucket, self.db.target_dim), np.float32)
        lengths = np.zeros(B, np.int32)
        tgt_codes = np.full((B, t_bucket), -1, np.int32)
        tgt_ctx = np.full((B, t_bucket, 5), -1, np.int32)
        for b, (tu, n) in enumerate(prepped):
            tgts[b, :n] = tu
            lengths[b] = n
            if halfphone:
                segs = segments_list[b]
                tgt_codes[b, :n] = [self._unit_vocab.get(s.name, -1)
                                    for s in segs]
                tgt_ctx[b, :n] = [[self._phone_vocab.get(p, 0)
                                   for p in s.quinphone] for s in segs]
            else:
                tgt_codes[b, :n] = 0
                tgt_ctx[b, :n] = 0

        self.ensure_sharded()
        out_len = utils.next_multiple(
            t_bucket * self.max_span + 2 * cfg.taper_length, 128)
        voice_ids = None
        if self.is_multivoice:
            vcodes = [self._voice_code(v) for v in voices]
            vcodes += [-1] * (B - B0)          # dummies match no voice
            voice_ids = jnp.asarray(np.asarray(vcodes, np.int32))
        with self.timer.stage("synth_batch_step"):
            unit_ids, costs, audio, totals = jax.device_get(batched_synth_step(
                self._sharded_voice, jnp.asarray(tgts), jnp.asarray(lengths),
                jnp.float32(cfg.join_cost_weight), jnp.float32(cfg.search_epsilon),
                voice_ids,
                jnp.asarray(tgt_codes) if halfphone else None,
                jnp.asarray(tgt_ctx) if halfphone else None,
                mesh=self._mesh,
                n_cand=min(cfg.n_candidates, self.n_units_padded),
                chunk=self.chunk, max_frag=self.max_frag,
                out_len=out_len, taper=cfg.taper_length,
                use_pallas=self._use_pallas(),
                mm_precision=cfg.preselect_precision,
                halfphone=self._use_ling(),
                ling_weights=self._ling_weights(),
                pallas_interpret=self._pallas_interpret(),
                greedy=greedy,
                squared_joins=cfg.join_cost_type == "squared",
                do_ola=cfg.preload_all_waves,
                margin=cfg.preselect_margin,
                zero_transient=cfg.zero_transient))
        results = []
        for b in range(B0):
            n = int(lengths[b])
            ids = np.asarray(unit_ids[b, :n])
            wave = (np.asarray(audio[b, : int(totals[b])])
                    if cfg.preload_all_waves else self._host_ola(ids))
            results.append({
                "wave": wave,
                "unit_ids": ids,
                "total_cost": float(costs[b]),
                "n_units": n,
            })
        return results

    def synth_streaming(self, feature_chunks, greedy: bool = True,
                        voice=None, fixed_frameshift: float = 0.0):
        """Streaming synthesis: consume target feature chunks, yield audio
        chunks as soon as their units are decided.

        BASELINE.json config #4 ("DNN-predicted target features + join
        costs, streaming synthesis").  Decoding is greedy-online per chunk
        with the join context carried across chunk boundaries (the reference
        greedy_search variant generalised to a stream); each yielded audio
        chunk is OLA-complete except for its trailing taper, which is summed
        into the next chunk.  The whole per-chunk step — preselect (Pallas
        when enabled), greedy decode, chunk OLA — is ONE device program;
        the host only carries the 2*taper crossfade tail between chunks.

        ``feature_chunks``: iterable of (n_i, d) arrays.  With the default
        ``fixed_frameshift = 0`` they are epoch-rate trajectories; setting
        ``fixed_frameshift > 0`` (seconds) declares them FIXED-RATE
        DNN-style outputs (Merlin-shaped, config #4 as specified): the
        predicted lf0 stream is integrated into a pitch-synchronous epoch
        grid incrementally — the integration phase carries across chunk
        boundaries (features.world.StreamingEpochResampler) — and every
        stream is resampled onto it before decoding, chunk by chunk.
        ``voice``: required for multi-voice DBs — name or id to select from.
        Yields float32 audio arrays.
        """
        cfg = self.cfg
        if self.db.target_representation == "halfphone":
            raise NotImplementedError("streaming synthesis is epoch-mode only")
        if fixed_frameshift and fixed_frameshift > 0:
            from snickery_tpu.features.world import StreamingEpochResampler
            lf0_col = None
            for (name, a, b) in cfg.stream_slices:
                if name == "lf0":
                    lf0_col = a
            if lf0_col is None:
                raise ValueError(
                    "fixed_frameshift streaming needs an lf0 stream to "
                    "integrate the epoch grid from")
            resampler = StreamingEpochResampler(
                lf0_col, cfg.sample_rate, fixed_frameshift)

            def epoch_chunks():
                for chunk in feature_chunks:
                    rows = resampler.push(np.asarray(chunk, np.float32))
                    if len(rows):
                        yield rows
                rows = resampler.flush()
                if len(rows):
                    yield rows

            yield from self.synth_streaming(
                epoch_chunks(), greedy=greedy, voice=voice)
            return
        if self.is_multivoice and voice is None:
            raise ValueError(
                "this is a multi-voice DB: pass voice=<name or id> "
                f"(available: {self.db.voice_names})")
        vid = self._voice_code(voice) if self.is_multivoice else 0
        k = self.frames_per_unit
        d = cfg.target_dim
        ddb = self.device_db
        use_pallas = self._use_pallas()
        ctx = None                          # running join context (dj,)
        t2 = 2 * cfg.taper_length
        tail = np.zeros(t2, np.float32)
        leftover = np.zeros((0, d), np.float32)
        n_cand = min(cfg.n_candidates, self.n_units_padded)
        self.last_stream_unit_ids: list[np.ndarray] = []   # diagnostics
        # per-chunk stage timings (ms), for latency decomposition: host-side
        # feature prep, async step dispatch, and the blocking device fetch
        # (which under depth-1 pipelining includes any residual device
        # compute + the tunnel round trip + the audio payload transfer)
        stages: dict[str, list] = {"pull_ms": [], "prep_ms": [],
                                   "dispatch_ms": [], "fetch_ms": []}
        self.last_stream_stages = stages
        self._last_stream_step = None       # (args, kwargs) for microbench

        def chunks_then_flush():
            yield from feature_chunks
            yield None                       # sentinel: flush leftover

        def finish(pending):
            # ONE host fetch per chunk: the axon transfer round-trip
            # (~50-100 ms) is the latency floor, so never pay it twice
            nonlocal tail
            unit_ids, audio, total, t_units = pending
            t0 = time.time()
            unit_ids, audio, total = jax.device_get((unit_ids, audio, total))
            stages["fetch_ms"].append((time.time() - t0) * 1e3)
            ids = np.asarray(unit_ids)[:t_units]
            self.last_stream_unit_ids.append(ids)
            if cfg.preload_all_waves:
                audio = np.array(audio)[: int(total)]
            else:
                audio = self._host_ola(ids)
            audio[:t2] += tail
            tail = audio[-t2:].copy()
            return audio[:-t2]

        # depth-1 pipelining: chunk i+1 is ENQUEUED before chunk i's audio
        # is fetched — the join-context dependency between chunks is a
        # device array, so no host sync is needed, and the fetch round trip
        # overlaps the next chunk's device compute.
        pending = None
        src = chunks_then_flush()
        while True:
            # explicit pull so upstream chunk PRODUCTION cost (e.g. the
            # fixed-rate epoch resampler) is timed separately from prep
            t_pull = time.time()
            try:
                chunk_feats = next(src)
            except StopIteration:
                break
            stages["pull_ms"].append((time.time() - t_pull) * 1e3)
            t_prep = time.time()
            if chunk_feats is None:
                # end of stream: pad any leftover epochs to one final unit by
                # repeating the last frame (otherwise up to k-1 trailing
                # pitch periods would be silently dropped)
                if len(leftover) == 0:
                    break
                reps = k - len(leftover) % k if len(leftover) % k else 0
                feats = np.concatenate(
                    [leftover, np.repeat(leftover[-1:], reps, axis=0)])
            else:
                feats = np.concatenate([leftover, np.asarray(chunk_feats, np.float32)])
            t_units = len(feats) // k
            if t_units == 0:
                leftover = feats
                continue
            leftover = feats[t_units * k:]
            if chunk_feats is None:
                leftover = np.zeros((0, d), np.float32)
            tgt = feats[: t_units * k].reshape(t_units, k * d)
            t_bucket = utils.bucket_length(t_units, tuple(cfg.length_buckets))
            if use_pallas:
                from snickery_tpu.ops.pallas_topk import T_TILE
                t_bucket = utils.next_multiple(t_bucket, T_TILE)
            tgt_pad = np.pad(tgt, ((0, t_bucket - t_units), (0, 0)))
            codes = np.full(t_bucket, -1, np.int32)
            codes[:t_units] = vid
            out_len = utils.next_multiple(
                t_bucket * self.max_span + t2, 128)
            step_args = (
                ddb, jnp.asarray(tgt_pad), jnp.int32(t_units),
                jnp.asarray(codes),
                (jnp.zeros((ddb.sqrt_wj.shape[0],), jnp.float32)
                 if ctx is None else ctx),
                jnp.float32(0.0 if ctx is None else cfg.join_cost_weight),
                jnp.float32(cfg.join_cost_weight))
            step_kw = dict(
                n_cand=n_cand, chunk=self.chunk, use_pallas=use_pallas,
                mm_precision=cfg.preselect_precision,
                multivoice=self.is_multivoice,
                max_frag=self.max_frag, out_len=out_len,
                taper=cfg.taper_length,
                pallas_interpret=self._pallas_interpret(),
                squared_joins=cfg.join_cost_type == "squared",
                do_ola=cfg.preload_all_waves,
                margin=cfg.preselect_margin,
                zero_transient=cfg.zero_transient)
            stages["prep_ms"].append((time.time() - t_prep) * 1e3)
            t_disp = time.time()
            unit_ids, ctx, audio, total = _streaming_step(
                *step_args, **step_kw)
            stages["dispatch_ms"].append((time.time() - t_disp) * 1e3)
            self._last_stream_step = (step_args, step_kw)
            if pending is not None:
                yield finish(pending)
            pending = (unit_ids, audio, total, t_units)
        if pending is not None:
            yield finish(pending)
        yield tail

    def halfphone_targets_from_features(
        self, features: np.ndarray, epochs: np.ndarray, segments: list
    ) -> tuple[np.ndarray, list]:
        """Build unit-rate halfphone targets ([first, mid, last] frames) from
        an epoch-rate trajectory + the target's halfphone segmentation.

        Uses the same frame-picking rule as the DB builder
        (voicedb.build.halfphone_frame_indices) so targets and units can
        never desynchronise."""
        from snickery_tpu.io.labels import segments_to_sample_bounds
        from snickery_tpu.voicedb.build import halfphone_frame_indices

        bounds = segments_to_sample_bounds(segments, self.cfg.sample_rate)
        rows, kept = [], []
        for seg, e0, mid, e1 in halfphone_frame_indices(
                segments, bounds, epochs, len(features)):
            rows.append(np.concatenate([features[e0], features[mid], features[e1]]))
            kept.append(seg)
        return np.asarray(rows, np.float32), kept

    def selected_features(self, unit_ids: np.ndarray) -> np.ndarray:
        """Epoch-rate feature trajectory of the selected units (for magphase
        resynthesis / inspection): (n_units * k, d)."""
        k = self.frames_per_unit
        d = self.cfg.target_dim
        feats = np.asarray(self.db.unit_features[np.asarray(unit_ids)])
        return feats.reshape(len(unit_ids) * k, d)

    def resynth_magphase(self, unit_ids: np.ndarray, target_lf0: np.ndarray | None = None) -> np.ndarray:
        """Magphase resynthesis path (reference's magphase output mode with
        optional target-F0 imposition and join smoothing, SURVEY.md §2 row 5)."""
        from snickery_tpu.features.magphase import magphase_synthesis

        cfg = self.cfg
        traj = self.selected_features(unit_ids)
        if cfg.magphase_smooth_joins > 0:
            from snickery_tpu.features.smoothing import smooth_joins
            traj = np.asarray(smooth_joins(
                jnp.asarray(traj), self.frames_per_unit,
                width=cfg.magphase_smooth_joins))
        streams = {}
        for name, a, b in cfg.stream_slices:
            streams[name] = traj[:, a:b]
        for required in ("mag", "real", "imag"):
            if required not in streams:
                raise ValueError("magphase resynthesis needs mag/real/imag streams")
        if "lf0" not in streams:
            streams["lf0"] = np.asarray(
                self.db.unit_lf0[np.asarray(unit_ids)]).reshape(-1, 1)
        use_tgt = cfg.magphase_use_target_f0 and target_lf0 is not None
        return magphase_synthesis(
            streams, cfg.sample_rate,
            target_lf0=(np.asarray(target_lf0).reshape(-1) if use_tgt else None),
            overlap=cfg.magphase_overlap,
        )
