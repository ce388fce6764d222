#!/usr/bin/env python
"""Micro-bench order_topk_positions variants at the production shape.

(65536, 48) f32 values + int32 ids -> (65536, 30) positions in canonical
(value, id) lexicographic order.  The production form (round-4 unrolled
python loop over picks) measures ~59 ms isolated — each pick is a
separate fusion over a minor-dim-48 array (37.5% lane occupancy).  Two
candidate fixes:

  sort3    ONE lax.sort over (vals, ids, iota) rows — stable lexicographic
           by construction, positions fall out of the third operand.
  major    transpose to (48, 65536) so the 65536 axis rides the lanes and
           the pick loop reduces over sublanes — full-tile elementwise.

Exactness of every variant is asserted against the current implementation
on adversarial data (duplicate values + shuffled ids) before timing.
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
from snickery_tpu.ops.topk import order_topk_positions

T, N, K = 65536, 48, 30


def order_sort3(vals, ids, k):
    T_, n = vals.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (T_, n), 1)
    _, _, pos = jax.lax.sort((vals, ids.astype(jnp.int32), iota),
                             dimension=1, num_keys=2, is_stable=True)
    return pos[:, :k]


def order_major(vals, ids, k):
    T_, n = vals.shape
    v = vals.T                       # (n, T) — lanes ride the big axis
    idd = ids.astype(jnp.int32).T
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, T_), 0)
    big = jnp.int32(2 ** 30)
    outs = []
    for _ in range(min(k, n)):
        m = jnp.min(v, axis=0)
        tied = v == m[None, :]
        sel_id = jnp.min(jnp.where(tied, idd, big), axis=0)
        hit = tied & (idd == sel_id[None, :])
        pos = jnp.min(jnp.where(hit, iota, n), axis=0).astype(jnp.int32)
        outs.append(jnp.minimum(pos, n - 1))
        v = jnp.where(hit, jnp.inf, v)
        idd = jnp.where(hit, big, idd)
    return jnp.stack(outs, axis=1)


def main():
    utils.enable_compilation_cache()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    vals = rng.standard_normal((T, N)).astype(np.float32)
    # adversarial: heavy duplicate values, shuffled ids, some inf slots
    vals[:, ::3] = vals[:, ::6].repeat(2, axis=1)[:, : len(vals[0, ::3])]
    vals[:256, 5] = np.inf
    ids = np.stack([rng.permutation(N) for _ in range(T)]).astype(np.int32) * 7
    vals_d, ids_d = jnp.asarray(vals), jnp.asarray(ids)

    f_ref = jax.jit(lambda v, i: order_topk_positions(v, i, K))
    f_sort3 = jax.jit(lambda v, i: order_sort3(v, i, K))
    f_major = jax.jit(lambda v, i: order_major(v, i, K))

    ref = np.asarray(jax.block_until_ready(f_ref(vals_d, ids_d)))
    res = {}
    for name, f in [("current", f_ref), ("sort3", f_sort3), ("major", f_major)]:
        out = np.asarray(jax.block_until_ready(f(vals_d, ids_d)))
        exact = bool((out == ref).all())
        t0 = time.time()
        for _ in range(10):
            out = f(vals_d, ids_d)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / 10 * 1e3
        res[name] = {"ms": round(ms, 2), "exact": exact}
        print(f"# {name}: {ms:.2f} ms exact={exact}", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
