"""Sharded, batched synthesis: the multi-chip compute path.

Layout (north star; SURVEY.md §5.8):
- raw unit blocks          (q, D+1) -> row-sharded over the ``db`` mesh axis
  (ONE array per shard carrying the raw features, from which the preselect
  operand AND both join contexts are derived on device — see
  voicedb.device_layout; 3x less per-shard HBM than feats + jl + jr)
- cutpoints cut1/cut2      (Mp,)    -> row-sharded over ``db``
- waves                    (S,)     -> replicated (see the budget note below)
- target batch             (B, T, D)-> sharded over ``data``

Per synthesis step, inside ``shard_map`` (ndb = size of the db axis):
1. each (data, db) device computes local top-k of its DB shard for its
   local batch rows (chunked matmul-distance scan / Pallas kernel — MXU),
2. it gathers the local winners' join contexts + cutpoints from its OWN
   row shard (candidate payloads: k rows per target row, tiny vs the 2*M*dj
   full join matrices),
3. ``all_to_all`` over ``db`` (ICI) redistributes (rank, id, cost, jl, jr,
   cuts): each member keeps only its 1/ndb SUB-BATCH of utterances but
   receives those rows' candidates from EVERY shard.  An all_to_all is a
   transpose — per-device volume is B_local*T*k*dj regardless of ndb
   (an all_gather of the same payload would grow ndb-fold),
4. re-top-k to n_candidates (exactly the global top-k), then Viterbi + OLA
   run on the sub-batch only — decode throughput scales with the WHOLE
   mesh (data x db), not just the data axis.

Memory budget at the 1.15M-unit bench voice (d=151, f32): ONE ~665 MB raw
block (features + jr-exception column; was 660 MB features + 2x660 MB join
contexts before the device_layout rework) shards ndb-ways; cutpoints 9 MB
shard too.  Only
the corpus audio stays replicated (~250 MB/h at 16 kHz) because the OLA
gather needs arbitrary rows of it; voices whose audio would not fit next
to the DB can set ``preload_all_waves=False`` (audio stays on host, OLA
runs in numpy after decode) — then NOTHING over ~10 MB is replicated.

``sharded_norm_stats`` is the DB-building (training-side) collective:
mean/variance over row-sharded unit features via ``psum``.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from snickery_tpu.ops.ola import overlap_add_units
from snickery_tpu.ops.topk import (halfphone_exact_rank,
                                   halfphone_lattice_mask,
                                   order_topk_positions, preselect_margin,
                                   topk_preselect, zero_transient_default)
from snickery_tpu.ops.viterbi import greedy_decode, viterbi_decode
from snickery_tpu.voicedb.device_layout import (affine_rows,
                                                gather_join_contexts)


class ShardedVoice(NamedTuple):
    """Device arrays of a voice DB placed on a (data, db) mesh."""
    raw: jax.Array        # (ndb*q, kd+1) RAW unit feature blocks with the
                          # jr-exception pointer column, row-sharded over
                          # "db" — each shard gets its own (q, kd+1) block
                          # with block-LOCAL pointers (voicedb.device_layout
                          # builds them, including the cross-shard boundary
                          # rows).  The preselect operand and BOTH join
                          # contexts derive from this one array: 3x less
                          # per-shard HBM than feats + jl|jr (epoch mode)
    n_real: jax.Array     # scalar int32, replicated: global rows >= n_real
                          # are padding
    cut1: jax.Array       # (Mp,) row-sharded over "db"
    cut2: jax.Array       # (Mp,) row-sharded over "db"
    waves: jax.Array      # (S,)  replicated (f32 or int16; see budget note)
    wave_scale: jax.Array # scalar f32: audio = waves * wave_scale
    mean_t: jax.Array     # (D,)  replicated: target normalisation + weights
    std_t: jax.Array      # (D,)  replicated
    sqrt_wt: jax.Array    # (D,)  replicated
    mean_j: jax.Array     # (dj,) replicated: join-context normalisation
    std_j: jax.Array      # (dj,) replicated
    sqrt_wj: jax.Array    # (dj,) replicated
    part: jax.Array       # (Mp,) per-unit voice/partition id, row-sharded over "db"
                          # (all-zero for single-voice DBs)
    codes: jax.Array      # (Mp,) halfphone codes, row-sharded (zeros epoch mode)
    ctx: jax.Array        # (Mp, 5) quinphone codes, row-sharded


def shard_voice(mesh: Mesh, raw_block, cut1, cut2, waves, mean_t, std_t,
                sqrt_wt, mean_j=None, std_j=None, sqrt_wj=None, n_real=None,
                part=None, codes=None, ctx=None,
                wave_scale=1.0) -> ShardedVoice:
    """Place padded DB arrays onto the mesh with the layout above.

    ``raw_block`` is the (ndb*q, kd+1) raw block array from
    ``voicedb.device_layout.build_raw_blocks(..., ndb=mesh db size)`` —
    either a host array or an already-device-resident one (on a 1x1 mesh
    the Synthesiser's DeviceDB block is aliased directly, no copy).
    ``mean_j``/``std_j``/``sqrt_wj`` default to identity over ``dj = kd``
    columns (synthetic test voices whose features are already model-space).
    ``n_real`` defaults to the cutpoint row count (no padding rows).
    """
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("db", None))
    ids = NamedSharding(mesh, P("db"))
    put = jax.device_put
    mp = np.shape(cut1)[0]
    kd = np.shape(raw_block)[1] - 1
    if mean_j is None:
        from snickery_tpu.voicedb.device_layout import identity_affine
        mean_j, std_j, sqrt_wj = identity_affine(kd)
    if n_real is None:
        n_real = np.int32(mp)
    return ShardedVoice(
        raw=put(jnp.asarray(raw_block, jnp.float32), rows),
        n_real=put(jnp.asarray(n_real, jnp.int32), repl),
        cut1=put(jnp.asarray(cut1, jnp.int32), ids),
        cut2=put(jnp.asarray(cut2, jnp.int32), ids),
        waves=put(jnp.asarray(waves), repl),
        wave_scale=put(jnp.float32(wave_scale), repl),
        mean_t=put(jnp.asarray(mean_t, jnp.float32), repl),
        std_t=put(jnp.asarray(std_t, jnp.float32), repl),
        sqrt_wt=put(jnp.asarray(sqrt_wt, jnp.float32), repl),
        mean_j=put(jnp.asarray(mean_j, jnp.float32), repl),
        std_j=put(jnp.asarray(std_j, jnp.float32), repl),
        sqrt_wj=put(jnp.asarray(sqrt_wj, jnp.float32), repl),
        part=put(jnp.asarray(
            part if part is not None else np.zeros(mp, np.int32),
            jnp.int32), ids),
        codes=put(jnp.asarray(
            codes if codes is not None else np.zeros(mp, np.int32),
            jnp.int32), ids),
        ctx=put(jnp.asarray(
            ctx if ctx is not None else np.zeros((mp, 5), np.int32),
            jnp.int32), rows),
    )


def _select_decode_batch(
    raw_shard, cut1_shard, cut2_shard,
    part_shard, codes_shard, ctx_shard,
    targets, lengths, voice_ids, tgt_codes, tgt_ctx,
    aff_t, aff_j, n_real,
    *, n_cand, chunk, jcw, eps, db_axis, ndb, m_shard, use_pallas=False,
    multivoice=False, mm_precision="highest", halfphone=False,
    ling_weights=None, pallas_interpret=False, greedy=False,
    squared_joins=False, margin=-1, zero_transient=-1,
):
    """Batched selection + decode on one device (runs inside shard_map).

    The whole local batch's target frames are FLATTENED to (B*T, D) for ONE
    preselect pass (a single chunked matmul scan — ~7x faster than vmapping
    preselect per utterance).  With ndb > 1 the function then keeps only its
    SUB-BATCH of B/ndb utterances after the all_to_all exchange (see the
    module docstring) and decodes those.

    Halfphone mode: quinphone penalties are fused into the local preselect
    (they pollute the ranking scores, so exact acoustic target costs are
    recomputed for the k local winners from the LOCAL feature shard before
    the exchange — global candidate ids cannot index a shard).

    Returns per-SUB-batch (unit_ids (b_sub, T), costs (b_sub,),
    cut1/cut2 of the chosen units (b_sub, T), lengths (b_sub,)).
    """
    B, T, D = targets.shape
    m_local = m_shard
    kd = D
    dj = aff_j[2].shape[0]
    b_sub = B // ndb
    shard_id = jax.lax.axis_index(db_axis)
    # row validity against GLOBAL padding: rows at global id >= n_real are
    # the 1e6 never-wins sentinel in the derived operand
    nr_local = jnp.clip(n_real - shard_id * m_local, 0, m_local)
    db_affine = (*aff_t, nr_local)
    # zero-transient mode: the kernel consumes the resident raw shard
    # directly — see ops.pallas_topk + ops.topk.zero_transient_default
    zt = (zero_transient_default(use_pallas, mm_precision)
          if zero_transient < 0 else bool(use_pallas and zero_transient))
    db_op = raw_shard if zt else raw_shard[:m_local, :kd]
    # a sharded DB slice need not stay divisible by the configured scan
    # chunk (Pallas padding scales by mesh_db, not by this chunk): fall
    # back to the largest common divisor so topk_preselect's divisibility
    # contract always holds (ADVICE.md round 2)
    if m_local % chunk != 0:
        chunk = math.gcd(chunk, m_local)
    live = (jnp.arange(T, dtype=jnp.int32)[None, :] < lengths[:, None])   # (B, T)
    tw = jnp.where(live[:, :, None], targets, 0.0)
    tw_flat = tw.reshape(B * T, D)

    k_local = min(n_cand + preselect_margin(use_pallas, mm_precision,
                                            halfphone, zero_transient=zt,
                                            override=margin),
                  m_local)
    tgt_part = jnp.repeat(voice_ids.astype(jnp.int32), T)            # (B*T,)
    ling = None
    if halfphone:
        ling = (tgt_codes.reshape(B * T), tgt_ctx.reshape(B * T, 5),
                codes_shard, ctx_shard)
    if use_pallas:
        from snickery_tpu.ops.pallas_topk import T_TILE, pallas_topk_preselect
        rows = tw_flat.shape[0]
        pad = (-rows) % T_TILE              # kernel requires rows % T_TILE == 0
        tw_k = jnp.pad(tw_flat, ((0, pad), (0, 0))) if pad else tw_flat
        part = None
        if multivoice:
            # padded target rows get id -1: they match no DB unit
            tp = jnp.pad(tgt_part, (0, pad), constant_values=-1) if pad else tgt_part
            part = (tp, part_shard)
        ling_k = ling
        if ling is not None and pad:
            ling_k = (jnp.pad(ling[0], (0, pad), constant_values=-1),
                      jnp.pad(ling[1], ((0, pad), (0, 0)), constant_values=-1),
                      ling[2], ling[3])
        idx_local, scores_local = pallas_topk_preselect(
            tw_k, db_op, k=k_local, mm_precision=mm_precision, sort=False,
            partition=part, linguistic=ling_k, ling_weights=ling_weights,
            interpret=pallas_interpret, db_affine=db_affine,
            zero_transient=zt, m_rows=m_local if zt else None)
        if pad:
            idx_local = idx_local[:rows]
            scores_local = scores_local[:rows]
    else:
        idx_local, scores_local = topk_preselect(
            tw_flat, db_op, k=k_local, chunk=chunk,
            partition=(tgt_part, part_shard), linguistic=ling,
            ling_weights=ling_weights, db_affine=db_affine)
    idx_global = idx_local + shard_id * m_local

    # exact f32 rescoring of the k local winners (local-id gather): the
    # kernel may RANK with bf16-split matmuls (split3/split3cat), but the
    # cost lattice must see exact distances — otherwise split noise flips
    # near-tied Viterbi decisions (measured: ~6% unit-sequence disagreement
    # vs the float64 oracle at 1M units without this).  inf kernel scores
    # (partition-starved slots) stay inf.
    rows_c = raw_shard[idx_local]                                 # (B*T, k, kd+1)
    valid_c = idx_local < nr_local
    cand_feats = affine_rows(rows_c[..., :kd], *aff_t, valid_c, 1e6)
    diff = cand_feats - tw_flat[:, None, :]
    sq_local = jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
    ac_local = jnp.sqrt(sq_local)
    ac_local = jnp.where(jnp.isinf(scores_local), jnp.inf, ac_local)
    mism_local = None
    if halfphone:
        # identity fallback rule in the lattice (same MASK semantics +
        # rationale as synth.synth_pipeline_step — see halfphone_lattice_
        # mask).  "A same-name candidate exists at this step" must be
        # decided on the GLOBAL candidate set, so the flags travel through
        # the exchange and the mask is applied after the re-top-k merge.
        mism_local = (codes_shard[idx_local]
                      != tgt_codes.reshape(B * T)[:, None])
        # ranking key: exact-f32 (squared distance + linguistic penalty),
        # replacing the approximate kernel scores — pool boundary and
        # candidate order then match the float64 oracle (see
        # ops.topk.halfphone_exact_rank)
        rank_local = halfphone_exact_rank(
            sq_local, scores_local, mism_local, ctx_shard[idx_local],
            tgt_ctx.reshape(B * T, 5), ling_weights)
    else:
        # epoch mode ranks by the exact distance itself
        rank_local = ac_local

    if ndb > 1:
        # candidate payloads from the LOCAL row shards, exchanged with the
        # scores: after this each member holds ONLY its sub-batch's rows
        # but with candidates from every shard along axis 1.  jl comes free
        # from the already-gathered rescore rows; jr is ONE local gather
        # through the exception pointer (voicedb.device_layout)
        jl_cand, jr_cand = gather_join_contexts(
            rows_c, raw_shard, idx_local, dj, *aff_j, valid_c)
        jlr_cand = jnp.concatenate([jl_cand, jr_cand], axis=-1)
        c1_cand = cut1_shard[idx_local]                       # (B*T, k)
        c2_cand = cut2_shard[idx_local]

        def x2(x):
            return jax.lax.all_to_all(
                x, db_axis, split_axis=0, concat_axis=1, tiled=True)

        all_rank, all_idx, all_ac = x2(rank_local), x2(idx_global), x2(ac_local)
        all_jlr = x2(jlr_cand)
        all_c1, all_c2 = x2(c1_cand), x2(c2_cand)
        all_mism = (x2(mism_local.astype(jnp.int32)) if halfphone else None)
        my = jax.lax.axis_index(db_axis)
        len_sub = jax.lax.dynamic_slice_in_dim(lengths, my * b_sub, b_sub)
    else:
        all_rank, all_idx, all_ac = rank_local, idx_global, ac_local
        all_jlr = all_c1 = all_c2 = None           # gathered after re-top-k
        all_mism = (mism_local.astype(jnp.int32) if halfphone else None)
        len_sub = lengths

    # global re-top-k + canonical candidate order in ONE lexsort: candidates
    # sorted by (rank, unit-id) ascending, keep n_cand.  Viterbi breaks
    # exact ties by candidate position, so this order must match the
    # float64 oracle's (value, index) convention — kernel state-slot order
    # is arbitrary and changes with tiling/selection internals.
    live_sub = (jnp.arange(T, dtype=jnp.int32)[None, :]
                < len_sub[:, None])                               # (b_sub, T)
    order = order_topk_positions(all_rank, all_idx, n_cand)
    cand_idx = jnp.take_along_axis(all_idx, order, axis=-1)
    target_costs = jnp.take_along_axis(all_ac, order, axis=-1)
    if halfphone:
        # identity fallback MASK on the merged global candidate set (see
        # ops.topk.halfphone_lattice_mask for the f32-precision rationale):
        # the ranking puts every same-name candidate ahead of every
        # mismatched one (ID_RANK_PENALTY dominates the ranking key), so
        # deciding on the kept n_cand equals deciding on the full pool.
        mism_sel = jnp.take_along_axis(all_mism, order, axis=-1) != 0
        target_costs = halfphone_lattice_mask(target_costs, mism_sel)
    target_costs = jnp.where(live_sub.reshape(-1, 1), target_costs, 0.0)

    if ndb > 1:
        jlr_sel = jnp.take_along_axis(all_jlr, order[:, :, None], axis=1)
        jl_sel, jr_sel = jlr_sel[..., :dj], jlr_sel[..., dj:]
        c1_sel = jnp.take_along_axis(all_c1, order, axis=-1)
        c2_sel = jnp.take_along_axis(all_c2, order, axis=-1)
    else:
        # single-shard fast path: jl free from the ordered rescore rows,
        # jr one gather of only the n_cand kept candidates
        idx_sel = jnp.take_along_axis(idx_local, order, axis=-1)
        rows_sel = jnp.take_along_axis(rows_c, order[:, :, None], axis=1)
        jl_sel, jr_sel = gather_join_contexts(
            rows_sel, raw_shard, idx_sel, dj, *aff_j, idx_sel < nr_local)
        c1_sel, c2_sel = cut1_shard[idx_sel], cut2_shard[idx_sel]

    n_sel = cand_idx.shape[1]
    jl_sel = jl_sel.reshape(b_sub, T, n_sel, dj)
    jr_sel = jr_sel.reshape(b_sub, T, n_sel, dj)
    cand_idx = cand_idx.reshape(b_sub, T, n_sel)
    target_costs = target_costs.reshape(b_sub, T, n_sel)

    def one(tc, jlc, jrc, length):
        if greedy:
            return greedy_decode(tc, jlc, jrc, join_cost_weight=jcw,
                                 length=length, squared_joins=squared_joins)
        return viterbi_decode(tc, jlc, jrc, join_cost_weight=jcw,
                              search_epsilon=eps, length=length,
                              squared_joins=squared_joins)

    paths, costs = jax.vmap(one)(target_costs, jl_sel, jr_sel, len_sub)
    pick = paths.reshape(b_sub * T, 1)
    unit_ids = jnp.take_along_axis(cand_idx.reshape(b_sub * T, n_sel),
                                   pick, axis=1).reshape(b_sub, T)
    unit_ids = jnp.where(live_sub, unit_ids, 0)
    cut1_path = jnp.take_along_axis(c1_sel, pick, axis=1).reshape(b_sub, T)
    cut2_path = jnp.take_along_axis(c2_sel, pick, axis=1).reshape(b_sub, T)
    zero = jnp.int32(0)
    cut1_path = jnp.where(live_sub, cut1_path, zero)
    cut2_path = jnp.where(live_sub, cut2_path, zero)
    return unit_ids, costs, cut1_path, cut2_path, len_sub


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_cand", "chunk", "max_frag", "out_len", "taper",
                     "use_pallas", "mm_precision", "halfphone", "ling_weights",
                     "pallas_interpret", "greedy", "squared_joins", "do_ola",
                     "margin", "zero_transient"),
)
def batched_synth_step(
    voice: ShardedVoice,
    targets: jax.Array,       # (B, T, D) raw unit-rate targets, sharded over "data"
    lengths: jax.Array,       # (B,) int32
    jcw: jax.Array,           # scalar
    eps: jax.Array,           # scalar
    voice_ids: jax.Array | None = None,   # (B,) voice id per utterance
    tgt_codes: jax.Array | None = None,   # (B, T) halfphone codes (halfphone mode)
    tgt_ctx: jax.Array | None = None,     # (B, T, 5) quinphone codes
    *,
    mesh: Mesh,
    n_cand: int,
    chunk: int,
    max_frag: int,
    out_len: int,
    taper: int,
    use_pallas: bool = False,
    mm_precision: str = "highest",
    halfphone: bool = False,
    ling_weights: tuple | None = None,
    pallas_interpret: bool = False,
    greedy: bool = False,
    squared_joins: bool = False,
    do_ola: bool = True,
    margin: int = -1,        # preselect rank margin (-1 = auto policy)
    zero_transient: int = -1,  # -1 = auto policy, 0 = off, 1 = on
):
    """Batched multi-utterance synthesis over the (data x db) mesh.

    The batch must divide the WHOLE mesh (B % (n_data * ndb) == 0): after
    the candidate exchange every device decodes B/(n_data*ndb) utterances,
    so the db axis adds decode/OLA throughput instead of replicating work
    (the Synthesiser pads batches with zero-length dummies to satisfy this).

    Returns (unit_ids (B, T), total_costs (B,), audio (B, out_len),
    total_samples (B,)).  ``greedy`` decodes with the online greedy rule
    instead of Viterbi; ``do_ola=False`` skips device concatenation for
    hosts that keep the corpus audio off-device (preload_all_waves).
    """
    db_axis = "db"
    ndb = mesh.shape["db"]
    n_data = mesh.shape["data"]
    # DB rows per db-shard: cut1 has exactly Mp rows; the raw blocks carry
    # extra halo/exception rows beyond m_shard (voicedb.device_layout)
    m_shard = voice.cut1.shape[0] // ndb
    multivoice = voice_ids is not None
    B, T, _ = targets.shape
    if B % (n_data * ndb) != 0:
        raise ValueError(
            f"batch {B} must be a multiple of mesh size {n_data}x{ndb}")
    if voice_ids is None:
        voice_ids = jnp.zeros(B, jnp.int32)
    if tgt_codes is None:
        tgt_codes = jnp.zeros((B, T), jnp.int32)
    if tgt_ctx is None:
        tgt_ctx = jnp.zeros((B, T, 5), jnp.int32)

    def shard_fn(raw_shard, n_real, cut1_shard, cut2_shard,
                 waves, wave_scale, mean_t, std_t,
                 sqrt_wt, mean_j, std_j, sqrt_wj,
                 part_shard, codes_shard, ctx_shard,
                 tgt_local, len_local, vid_local, tcodes_local, tctx_local,
                 jcw_, eps_):
        # tgt_local: (B_local, T, D)
        tw = (tgt_local - mean_t[None, None, :]) / std_t[None, None, :]
        tw = tw * sqrt_wt[None, None, :]

        unit_ids, costs, cut1_path, cut2_path, len_sub = _select_decode_batch(
            raw_shard, cut1_shard, cut2_shard,
            part_shard, codes_shard, ctx_shard,
            tw, len_local, vid_local, tcodes_local, tctx_local,
            (mean_t, std_t, sqrt_wt), (mean_j, std_j, sqrt_wj), n_real,
            n_cand=n_cand, chunk=chunk, jcw=jcw_, eps=eps_, db_axis=db_axis,
            ndb=ndb, m_shard=m_shard, use_pallas=use_pallas,
            multivoice=multivoice,
            mm_precision=mm_precision, halfphone=halfphone,
            ling_weights=ling_weights,
            pallas_interpret=pallas_interpret, greedy=greedy,
            squared_joins=squared_joins, margin=margin,
            zero_transient=zero_transient)

        if do_ola:
            def ola_one(c1, c2, len_one):
                return overlap_add_units(
                    waves, c1, c2, n_units=len_one,
                    max_frag=max_frag, out_len=out_len, taper=taper,
                    wave_scale=wave_scale)

            audio, totals = jax.vmap(ola_one)(cut1_path, cut2_path, len_sub)
        else:
            b_sub, t_loc = unit_ids.shape
            live = (jnp.arange(t_loc, dtype=jnp.int32)[None, :]
                    < len_sub[:, None])
            spans = jnp.where(live, cut2_path - cut1_path, 0)
            totals = 2 * taper + jnp.sum(spans, axis=1)
            audio = jnp.zeros((b_sub, 8), jnp.float32)
        return unit_ids, costs, audio, totals

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P("db", None),            # raw blocks (per-shard, device_layout)
            P(),                      # n_real (replicated scalar)
            P("db"), P("db"),         # cut1, cut2
            P(),                      # waves (replicated; see budget note)
            P(),                      # wave_scale
            P(), P(), P(),            # mean_t, std_t, sqrt_wt
            P(), P(), P(),            # mean_j, std_j, sqrt_wj
            P("db"),                  # part (voice ids, row-sharded)
            P("db"),                  # halfphone codes, row-sharded
            P("db", None),            # quinphone ctx, row-sharded
            P("data", None, None),    # targets
            P("data"),                # lengths
            P("data"),                # voice_ids
            P("data", None),          # tgt_codes
            P("data", None, None),    # tgt_ctx
            P(), P(),                 # jcw, eps
        ),
        out_specs=(
            P(("data", "db"), None),  # unit_ids (sub-batches tile B in order)
            P(("data", "db")),        # costs
            P(("data", "db"), None),  # audio
            P(("data", "db")),        # total samples
        ),
        check_vma=False,
    )(voice.raw, voice.n_real, voice.cut1, voice.cut2,
      voice.waves, voice.wave_scale, voice.mean_t, voice.std_t,
      voice.sqrt_wt, voice.mean_j, voice.std_j, voice.sqrt_wj,
      voice.part,
      voice.codes, voice.ctx,
      targets, lengths, voice_ids, tgt_codes, tgt_ctx, jcw, eps)


@functools.partial(jax.jit, static_argnames=("mesh",))
def sharded_norm_stats(unit_features: jax.Array, n_units: jax.Array, *, mesh: Mesh):
    """DB-building collective: per-dim mean/std over row-sharded unit
    features (padded rows zeroed by caller), via psum over BOTH mesh axes.

    This is the training-side analogue of the reference trainer's
    whole-corpus mean/std pass (SURVEY.md §3.1), expressed as the standard
    sum/sumsq psum pattern.
    """
    def shard_fn(feats_shard, n):
        s = jnp.sum(feats_shard, axis=0)
        ss = jnp.sum(feats_shard * feats_shard, axis=0)
        s = jax.lax.psum(jax.lax.psum(s, "db"), "data")
        ss = jax.lax.psum(jax.lax.psum(ss, "db"), "data")
        mean = s / n
        var = jnp.maximum(ss / n - mean * mean, 0.0)
        return mean, jnp.sqrt(jnp.maximum(var, 1e-16))

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(("data", "db"), None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(unit_features, n_units)
