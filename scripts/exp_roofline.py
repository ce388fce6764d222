#!/usr/bin/env python
"""Round-4 roofline decomposition of the config-3 step (VERDICT r4 item 4).

Two rounds stalled at RTF ~0.00156 (B=32, T=2048, 1.05M units); the verdict
demands either <= 0.0012 or a roofline proof that ~0.0015 is within 1.3x of
the achievable floor on this chip.  This measures the decomposition through
the production code:

  A. kernel-only: pallas_topk_preselect at the exact production shapes
     (65536 rows x 1.05M units, k = 30 + margin, split3cat zero-transient)
  B. kernel, selection stripped (select="packed3diag" times the fast path
     without the exact fallback — an optimistic selection bound), plus
     select="stream" (production)
  C. full step (batched_synth_step) vs greedy step (no Viterbi) vs
     do_ola=False step — differences give decode/OLA stage costs

against the analytic MXU speed of light:
     rows x Mp x K_pad MACs at 197 bf16-TFLOP/s (v5e public peak).
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
    import jax
    import jax.numpy as jnp
    from snickery_tpu.parallel import batched_synth_step
    from snickery_tpu.synth import Synthesiser
    from snickery_tpu.voicedb.build import build_voicedb

    log(f"device: {jax.devices()[0]}")
    utils.warm_transfer()

    cfg = bench_config(voice_name="bench1m")
    db = get_voice("bench1m",
                   lambda: build_voicedb(cfg, make_corpus(1_048_576 // 767, 40, 10_000, False)),
                   cfg, False)
    synth = Synthesiser(cfg, db=db)
    synth.ensure_sharded()

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
    tgts_dev = jnp.asarray(tgts)
    lengths_dev = jnp.asarray(lengths)
    res = {}

    def timeit(name, fn, iters=3):
        fn()                               # compile
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") and x.size < 1e7
            else None, out)
        wall = (time.time() - t0) / iters * 1e3
        res[name] = wall
        log(f"{name}: {wall:.1f} ms")
        return out

    # ---- C. full-step decomposition -------------------------------------
    def step(greedy=False, do_ola=True):
        out = batched_synth_step(
            synth._sharded_voice, tgts_dev, lengths_dev,
            jnp.float32(JCW), jnp.float32(0.0),
            mesh=synth._mesh, n_cand=30,
            chunk=synth.chunk, max_frag=synth.max_frag,
            out_len=out_len, taper=cfg.taper_length,
            use_pallas=True, mm_precision="split3cat",
            greedy=greedy, do_ola=do_ola)
        np.asarray(out[1])
        return out

    timeit("step_full", lambda: step())
    timeit("step_greedy", lambda: step(greedy=True))
    timeit("step_no_ola", lambda: step(do_ola=False))

    # ---- A/B. kernel-only at production shapes ---------------------------
    from snickery_tpu.ops.pallas_topk import pallas_topk_preselect
    ddb = synth.device_db
    kd = db.target_dim
    m_pad = int(ddb.cut1.shape[0])
    aff = (ddb.mean_t, ddb.std_t, ddb.sqrt_wt, ddb.n_real)
    rows = B * t_bucket
    tw = ((tgts.reshape(rows, kd) - np.asarray(ddb.mean_t))
          / np.asarray(ddb.std_t)) * np.asarray(ddb.sqrt_wt)
    tw_dev = jnp.asarray(tw.astype(np.float32))
    from snickery_tpu.const import PRESELECT_MARGIN_SPLIT3CAT
    k_sel = 30 + PRESELECT_MARGIN_SPLIT3CAT

    def kernel(select="auto", k=k_sel):
        out = pallas_topk_preselect(
            tw_dev, ddb.raw, k=k, mm_precision="split3cat", sort=False,
            db_affine=aff, zero_transient=True, m_rows=m_pad,
            select=select)
        np.asarray(out[1][:8])
        return out

    timeit("kernel_stream_k48", lambda: kernel("stream"))
    timeit("kernel_stream_k40", lambda: kernel("stream", k=40))
    try:
        timeit("kernel_packed3diag_k48", lambda: kernel("packed3diag"))
    except Exception as e:
        log(f"packed3diag failed: {type(e).__name__}: {e}")

    # ---- analytic MXU speed of light -------------------------------------
    K_pad = -(-3 * (kd + 1) // 128) * 128
    macs = rows * m_pad * K_pad
    sol_ms = macs * 2 / 197e12 * 1e3
    res["mxu_sol_ms"] = sol_ms
    res["macs"] = macs
    log(f"MXU speed of light ({rows} x {m_pad} x K_pad {K_pad}): "
        f"{sol_ms:.0f} ms at 197 bf16-TFLOP/s")

    print(json.dumps(res))
    with open(os.path.join(cache_dir(), "exp_roofline.json"), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
