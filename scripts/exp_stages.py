#!/usr/bin/env python
"""Round-4 stage-level timing of the config-3 decode tail.

The roofline (ARCHITECTURE.md "Step roofline") accounts 642 ms kernel +
~265 ms decode/assembly against a measured ~1,000 ms full step — leaving
~100 ms unattributed and the tail numbers carried over from round-3 stage
timers.  This times every post-kernel stage ISOLATED at the exact
production shapes (B=32 x T=2048 targets, 1.05M-unit DB, k_sel = 30+18,
N=30 kept), so the tail work has current numbers to aim at:

  rows_gather    raw[idx] candidate row fetch        (65536 x 48 rows)
  rescore        affine + diff + sq + sqrt            (on resident rows)
  order_topk     (rank, id) k-argmin sweep
  jr_gather      join-context derivation (1 more gather of 30 rows/step)
  viterbi        vmapped lattice decode (32 x 2048 x 30, dj=151)
  ola            vmapped row-granular crossfade OLA
  assembly       cut gathers + take_alongs + masks

plus the kernel at k=48 and k=30 (margin cost) and the full step for the
same-session total.  Writes exp_stages.json next to the bench cache.
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import bench  # noqa: E402
from bench import JCW, bench_config, cache_dir, get_voice, held_out_features, log, make_corpus, sync  # noqa: E402


def main():
    from snickery_tpu import utils
    utils.enable_compilation_cache()
    import functools
    import jax
    import jax.numpy as jnp
    from snickery_tpu.parallel import batched_synth_step
    from snickery_tpu.synth import Synthesiser
    from snickery_tpu.voicedb.build import build_voicedb
    from snickery_tpu.voicedb.device_layout import affine_rows, gather_join_contexts
    from snickery_tpu.ops.topk import order_topk_positions
    from snickery_tpu.ops.viterbi import viterbi_decode
    from snickery_tpu.ops.ola import overlap_add_units

    log(f"device: {jax.devices()[0]}")
    utils.warm_transfer()

    cfg = bench_config(voice_name="bench1m")
    db = get_voice("bench1m",
                   lambda: build_voicedb(cfg, make_corpus(1_048_576 // 767, 40, 10_000, False)),
                   cfg, False)
    synth = Synthesiser(cfg, db=db)
    synth.ensure_sharded()
    ddb = synth.device_db
    kd = db.target_dim
    dj = int(ddb.sqrt_wj.shape[0])
    m_pad = int(ddb.cut1.shape[0])
    aff_t = (ddb.mean_t, ddb.std_t, ddb.sqrt_wt, ddb.n_real)

    tgt_feats, _, _ = held_out_features(32, 128)
    t_cap = synth.cfg.length_buckets[0] + 2
    prepped = [synth.targets_from_features(f[:t_cap]) for f in tgt_feats]
    B = len(prepped)
    t_bucket = utils.bucket_length(max(n for _, n in prepped),
                                   tuple(synth.cfg.length_buckets))
    tgts = np.zeros((B, t_bucket, db.target_dim), np.float32)
    lengths = np.zeros(B, np.int32)
    for b, (tu, n) in enumerate(prepped):
        tgts[b, :n] = tu
        lengths[b] = n
    out_len = utils.next_multiple(
        t_bucket * synth.max_span + 2 * cfg.taper_length, 128)
    rows = B * t_bucket
    tw = ((tgts.reshape(rows, kd) - np.asarray(ddb.mean_t))
          / np.asarray(ddb.std_t)) * np.asarray(ddb.sqrt_wt)
    tw_dev = jnp.asarray(tw.astype(np.float32))
    tgts_dev = jnp.asarray(tgts)
    lengths_dev = jnp.asarray(lengths)
    res = {}

    def timeit(name, fn, iters=5):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        wall = (time.time() - t0) / iters * 1e3
        res[name] = round(wall, 2)
        log(f"{name}: {wall:.1f} ms")
        return out

    # ---- full step (same-session anchor) ---------------------------------
    def step(greedy=False, do_ola=True):
        out = batched_synth_step(
            synth._sharded_voice, tgts_dev, lengths_dev,
            jnp.float32(JCW), jnp.float32(0.0),
            mesh=synth._mesh, n_cand=30,
            chunk=synth.chunk, max_frag=synth.max_frag,
            out_len=out_len, taper=cfg.taper_length,
            use_pallas=True, mm_precision="split3cat",
            greedy=greedy, do_ola=do_ola)
        return out[1]

    timeit("step_full", lambda: step())
    timeit("step_no_ola", lambda: step(do_ola=False))
    timeit("step_greedy", lambda: step(greedy=True))

    # ---- kernel at k=48 / k=30 --------------------------------------------
    from snickery_tpu.ops.pallas_topk import pallas_topk_preselect
    from snickery_tpu.const import PRESELECT_MARGIN_SPLIT3CAT
    k_sel = 30 + PRESELECT_MARGIN_SPLIT3CAT

    def kernel(k=k_sel):
        return pallas_topk_preselect(
            tw_dev, ddb.raw, k=k, mm_precision="split3cat", sort=False,
            db_affine=aff_t, zero_transient=True, m_rows=m_pad)

    idx48, scores48 = timeit("kernel_k48", lambda: kernel())
    timeit("kernel_k30", lambda: kernel(k=30))

    # ---- isolated tail stages at the REAL candidate ids -------------------
    idx48 = jax.block_until_ready(idx48)

    @jax.jit
    def rows_gather(raw, idx):
        return raw[idx]

    rows_c = timeit("rows_gather_48", lambda: rows_gather(ddb.raw, idx48))

    @jax.jit
    def rescore(rows_c, idx, scores, tw_dev):
        valid = idx < ddb.n_real
        feats = affine_rows(rows_c[..., :kd], ddb.mean_t, ddb.std_t,
                            ddb.sqrt_wt, valid, 1e6)
        diff = feats - tw_dev[:, None, :]
        sq = jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
        ac = jnp.sqrt(sq)
        return jnp.where(jnp.isinf(scores), jnp.inf, ac)

    ac = timeit("rescore_compute",
                lambda: rescore(rows_c, idx48, scores48, tw_dev))

    @jax.jit
    def order_sel(ac, idx):
        order = order_topk_positions(ac, idx, 30)
        return (order, jnp.take_along_axis(idx, order, axis=-1),
                jnp.take_along_axis(ac, order, axis=-1))

    order, idx_sel, tc_sel = timeit("order_topk", lambda: order_sel(ac, idx48))

    @jax.jit
    def jr_gather(raw, rows_c, order, idx_sel):
        rows_sel = jnp.take_along_axis(rows_c, order[:, :, None], axis=1)
        return gather_join_contexts(rows_sel, raw, idx_sel, dj,
                                    ddb.mean_j, ddb.std_j, ddb.sqrt_wj,
                                    idx_sel < ddb.n_real)

    jl, jr = timeit("jr_gather_plus_affine",
                    lambda: jr_gather(ddb.raw, rows_c, order, idx_sel))

    jlb = jl.reshape(B, t_bucket, 30, dj)
    jrb = jr.reshape(B, t_bucket, 30, dj)
    tcb = tc_sel.reshape(B, t_bucket, 30)

    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("unroll",))
    def vit(tcb, jlb, jrb, lengths, unroll=8):
        def one(tc, l, r, n):
            return viterbi_decode(tc, l, r, join_cost_weight=jnp.float32(JCW),
                                  search_epsilon=jnp.float32(0.0), length=n,
                                  unroll=unroll)
        return jax.vmap(one)(tcb, jlb, jrb, lengths)

    paths, _ = timeit("viterbi_vmapped", lambda: vit(tcb, jlb, jrb, lengths_dev))
    for u in (16, 32):
        timeit(f"viterbi_unroll{u}",
               lambda u=u: vit(tcb, jlb, jrb, lengths_dev, unroll=u))

    @jax.jit
    def assemble(cut1, cut2, idx_sel, paths, lengths):
        idxb = idx_sel.reshape(B, t_bucket, 30)
        pick = paths.reshape(B * t_bucket, 1)
        uids = jnp.take_along_axis(idxb.reshape(B * t_bucket, 30), pick,
                                   axis=1).reshape(B, t_bucket)
        live = jnp.arange(t_bucket, dtype=jnp.int32)[None, :] < lengths[:, None]
        uids = jnp.where(live, uids, 0)
        c1 = jnp.where(live, cut1[uids], 0)
        c2 = jnp.where(live, cut2[uids], 0)
        return uids, c1, c2

    uids, c1, c2 = timeit("assembly_cut_gathers",
                          lambda: assemble(ddb.cut1, ddb.cut2, idx_sel,
                                           paths, lengths_dev))

    @jax.jit
    def ola(waves, c1, c2, lengths):
        def one(a, b, n):
            return overlap_add_units(waves, a, b, n_units=n,
                                     max_frag=synth.max_frag, out_len=out_len,
                                     taper=cfg.taper_length,
                                     wave_scale=ddb.wave_scale)
        return jax.vmap(one)(c1, c2, lengths)

    timeit("ola_vmapped", lambda: ola(ddb.waves, c1, c2, lengths_dev))

    tail = sum(res[k] for k in ("rows_gather_48", "rescore_compute",
                                "order_topk", "jr_gather_plus_affine",
                                "viterbi_vmapped", "assembly_cut_gathers",
                                "ola_vmapped"))
    res["tail_sum_isolated"] = round(tail, 1)
    res["step_minus_kernel48"] = round(res["step_full"] - res["kernel_k48"], 1)
    log(f"tail (isolated sum): {tail:.1f} ms; "
        f"step - kernel: {res['step_minus_kernel48']:.1f} ms")

    print(json.dumps(res))
    with open(os.path.join(cache_dir(), "exp_stages.json"), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
