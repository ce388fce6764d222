#!/usr/bin/env python
"""Decompose the decode-tail gather costs at exact production shapes.

exp_stages shows order_topk=60 ms and jr_gather_plus_affine=104 ms while
the pick loop alone is 3.8 ms — the money is in take_along_axis /
row-gather lowering, not the selection math.  This times each candidate
form so the synth rewire is measurement-driven:

  takealong2      the two (65536,48)->(65536,30) take_alongs the pick
                  loop's outputs could replace
  loop_triple     pick loop emitting (pos, ids, vals) directly
  loop_triple_x   ... plus one extra where-sum extraction per pick (the
                  halfphone ac!=rank case)
  rows_takealong  take_along rows_c (65536,48,152) by order (current)
  rows_gather     fresh raw[idx_sel] row gather (65536,30 rows) instead
  jr_gather       raw[g] row gather (the unavoidable one)
  affine2         the two (65536,30,151) affines
  bitcast_g       ptr bitcast + exception select

Synthetic data at production shapes/dtypes; gather indices drawn to
mimic preselect locality (clustered ids).
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from snickery_tpu import utils

T, N, K, KD, M = 65536, 48, 30, 151, 1_052_672
DJ = 151


def pick_loop(vals, ids, k, extra=None):
    T_, n = vals.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (T_, n), 1)
    big = jnp.int32(2 ** 30)
    v, idd = vals, ids.astype(jnp.int32)
    poss, outi, outv, outx = [], [], [], []
    for _ in range(min(k, n)):
        m = jnp.min(v, axis=1)
        tied = v == m[:, None]
        sel_id = jnp.min(jnp.where(tied, idd, big), axis=1)
        hit = tied & (idd == sel_id[:, None])
        pos = jnp.min(jnp.where(hit, iota, n), axis=1).astype(jnp.int32)
        poss.append(jnp.minimum(pos, n - 1))
        outi.append(sel_id)
        outv.append(m)
        if extra is not None:
            outx.append(jnp.sum(jnp.where(hit, extra, 0.0), axis=1))
        v = jnp.where(hit, jnp.inf, v)
        idd = jnp.where(hit, big, idd)
    r = (jnp.stack(poss, 1), jnp.stack(outi, 1), jnp.stack(outv, 1))
    return r + ((jnp.stack(outx, 1),) if extra is not None else ())


def main():
    utils.enable_compilation_cache()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)

    vals = rng.standard_normal((T, N)).astype(np.float32)
    base = rng.integers(0, M - 4096, T)[:, None]
    ids = (base + rng.integers(0, 4096, (T, N))).astype(np.int32)
    order = np.argsort(vals, axis=1)[:, :K].astype(np.int32)
    idx_sel = np.take_along_axis(ids, order, axis=1)
    raw = rng.standard_normal((M, KD + 1)).astype(np.float32)
    rows_c = rng.standard_normal((T, N, KD + 1)).astype(np.float32)
    mean = rng.standard_normal(DJ).astype(np.float32)
    std = (1 + rng.random(DJ)).astype(np.float32)
    w = rng.random(DJ).astype(np.float32)

    d = {k: jnp.asarray(v) for k, v in dict(
        vals=vals, ids=ids, order=order, idx_sel=idx_sel, raw=raw,
        rows_c=rows_c, mean=mean, std=std, w=w).items()}
    jax.block_until_ready(d["raw"])
    res = {}

    def timeit(name, f, *a, iters=10):
        g = jax.jit(f)
        out = jax.block_until_ready(g(*a))
        t0 = time.time()
        for _ in range(iters):
            out = g(*a)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / iters * 1e3
        res[name] = round(ms, 2)
        print(f"# {name}: {ms:.2f} ms", file=sys.stderr)
        return out

    timeit("takealong2", lambda v, i, o: (
        jnp.take_along_axis(i, o, axis=-1),
        jnp.take_along_axis(v, o, axis=-1)), d["vals"], d["ids"], d["order"])
    timeit("loop_triple", lambda v, i: pick_loop(v, i, K),
           d["vals"], d["ids"])
    timeit("loop_triple_x", lambda v, i: pick_loop(v, i, K, extra=v * 2),
           d["vals"], d["ids"])
    timeit("rows_takealong",
           lambda rc, o: jnp.take_along_axis(rc, o[:, :, None], axis=1),
           d["rows_c"], d["order"])
    timeit("rows_gather", lambda raw, i: raw[i], d["raw"], d["idx_sel"])
    timeit("jr_gather", lambda raw, i: raw[jnp.minimum(i + 1, M - 1)],
           d["raw"], d["idx_sel"])

    rows_sel = timeit("rows_takealong2",
                      lambda rc, o: jnp.take_along_axis(rc, o[:, :, None], axis=1),
                      d["rows_c"], d["order"])

    def affine2(rs, jr, mean, std, w):
        a = ((rs[..., :DJ] - mean) / std) * w
        b = ((jr[..., :DJ] - mean) / std) * w
        return a, b

    jr_rows = jax.jit(lambda raw, i: raw[jnp.minimum(i + 1, M - 1)])(
        d["raw"], d["idx_sel"])
    timeit("affine2", affine2, rows_sel, jr_rows, d["mean"], d["std"], d["w"])

    def bitcast_g(rs, i):
        ptr = jax.lax.bitcast_convert_type(rs[..., KD], jnp.int32)
        return jnp.where(ptr > 0, ptr, i + 1)

    timeit("bitcast_g", bitcast_g, rows_sel, d["idx_sel"])

    # fused: gather jr + both affines in ONE jit (what production would do)
    def jr_fused(raw, rs, i, mean, std, w):
        ptr = jax.lax.bitcast_convert_type(rs[..., KD], jnp.int32)
        g = jnp.where(ptr > 0, ptr, jnp.minimum(i + 1, M - 1))
        jrr = raw[g][..., :DJ]
        a = ((rs[..., :DJ] - mean) / std) * w
        b = ((jrr - mean) / std) * w
        return a, b

    timeit("jr_fused_all", jr_fused, d["raw"], rows_sel, d["idx_sel"],
           d["mean"], d["std"], d["w"])

    print(json.dumps(res))


if __name__ == "__main__":
    main()
