"""Viterbi lattice search as a ``lax.scan`` with on-chip join-cost fusion.

Replaces the reference's O(T·N²·d_join) numpy DP loop (SURVEY.md §3.2 hot
loop #3) with a scan whose per-step work is a single (N, d_join) x (d_join,
N) matmul (MXU) plus an (N, N) min-reduction (VPU) — the design called for
by the north star ("Viterbi lattice search compiles to a lax.scan DP with
on-chip cost fusion").

Cost model (reference semantics, SURVEY.md §2 row 4):
    total = sum_t  target_cost[t, s_t]
          + join_cost_weight * sum_t  join_dist(right[t-1, s_{t-1}], left[t, s_t])

where distances are *weighted Euclidean* (true sqrt).  Join features passed
in here must already be normalised and sqrt(weight)-scaled so the kernel is
weight-agnostic.  Natural successors have identical right/left context rows
(VoiceDB construction guarantees it), so their join distance is exactly 0.

``search_epsilon`` implements the reference's pruning knob as masking: states
whose running cost exceeds the current best by more than epsilon are removed
from the transition competition (identical selected paths when epsilon is
large enough; faster convergence of min-reductions when XLA can exploit it).

Tie-breaking: ``jnp.argmin`` returns the *first* minimal index, matching
``numpy.argmin`` — bit-identical decisions vs the float64 numpy oracle
require only that costs agree; the agreement harness (tests/test_agreement)
quantifies this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from snickery_tpu.const import BIG_PENALTY


def _pairwise_dists(right: jax.Array, left: jax.Array,
                    squared: bool = False) -> jax.Array:
    """(N, N) Euclidean (or squared-Euclidean) distances between rows of
    right (prev) and left (next)."""
    rr = jnp.sum(right * right, axis=-1)[:, None]
    ll = jnp.sum(left * left, axis=-1)[None, :]
    cross = jnp.dot(right, left.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    sq = jnp.maximum(rr + ll - 2.0 * cross, 0.0)
    return sq if squared else jnp.sqrt(sq)


@functools.partial(jax.jit, static_argnames=("squared_joins", "unroll"))
def viterbi_decode(
    target_costs: jax.Array,     # (T, N) f32 — BIG_PENALTY for padded slots
    join_left: jax.Array,        # (T, N, dj) candidate left contexts (pre-weighted)
    join_right: jax.Array,       # (T, N, dj) candidate right contexts (pre-weighted)
    join_cost_weight: jax.Array | float = 1.0,
    search_epsilon: jax.Array | float = 0.0,
    length: jax.Array | None = None,   # actual T (for padded lattices); scalar int
    squared_joins: bool = False,       # config join_cost_type == "squared"
    unroll: int = 8,                   # scan unroll (the step body is tiny —
                                       # dispatch-bound; swept in exp_stages)
) -> tuple[jax.Array, jax.Array]:
    """Best path through the candidate lattice.

    Returns (path (T,) int32 — chosen candidate column per step, total_cost).
    Steps at or beyond ``length`` are ignored (their target costs are treated
    as 0 for all states and the path column is arbitrary there).
    """
    T, N = target_costs.shape
    jcw = jnp.float32(join_cost_weight)
    eps = jnp.float32(search_epsilon)
    t_idx = jnp.arange(T, dtype=jnp.int32)
    live = jnp.ones((T,), bool) if length is None else (t_idx < length)
    # Dead (padded) steps: zero target cost, zero join in/out → the path
    # passes through state 0 at no cost and decisions before `length` are
    # unaffected.
    tc = jnp.where(live[:, None], target_costs, 0.0)

    def step(carry, inputs):
        prev_cost, prev_right = carry
        tc_t, jl_t, jr_t, live_t = inputs
        dists = _pairwise_dists(prev_right, jl_t, squared_joins)  # (N, N)
        # epsilon pruning: drop states far above the running best
        pruned = jnp.where(
            (eps > 0.0) & (prev_cost > jnp.min(prev_cost) + eps),
            BIG_PENALTY,
            prev_cost,
        )
        # Dead (padded) steps contribute no join cost: every state then
        # inherits the best running cost and points back at the best live
        # state, so backtracking from any final state is correct.
        trans = pruned[:, None] + jnp.where(live_t, jcw * dists, 0.0)  # (N, N)
        best_prev = jnp.argmin(trans, axis=0).astype(jnp.int32) # (N,)
        new_cost = jnp.min(trans, axis=0) + tc_t
        return (new_cost, jr_t), best_prev

    init = (tc[0], join_right[0])
    # unroll amortises the per-step scan dispatch overhead: the step body is
    # tiny (one (N,dj)x(dj,N) matmul + (N,N) reductions, ~0.02 us of MXU)
    # so T=2048 sequential steps are latency-bound (measured 54 ms -> the
    # scan overhead dominates); unroll=8 trades compile size for it
    (final_cost, _), backptrs = jax.lax.scan(
        step, init, (tc[1:], join_left[1:], join_right[1:], live[1:]),
        unroll=unroll,
    )
    # final state: best cost at the last *live* step.  Padded steps cost 0 and
    # keep backpointer chains intact, so argmin at T-1 equals argmin at
    # length-1 as long as padded target costs are 0 (they are).
    last_state = jnp.argmin(final_cost if T > 1 else tc[0]).astype(jnp.int32)
    total = jnp.min(final_cost if T > 1 else tc[0])

    def backtrack(state, bp_t):
        prev = bp_t[state]
        return prev, state

    # reverse scan: ys[i] = state at step i+1, final carry = state at step 0
    first_state, path_tail = jax.lax.scan(backtrack, last_state, backptrs,
                                          reverse=True, unroll=unroll)
    path = jnp.concatenate([first_state[None], path_tail]) if T > 1 else last_state[None]
    return path.astype(jnp.int32), total


@functools.partial(jax.jit, static_argnames=("squared_joins",))
def greedy_decode(
    target_costs: jax.Array,     # (T, N)
    join_left: jax.Array,        # (T, N, dj)
    join_right: jax.Array,       # (T, N, dj)
    join_cost_weight: jax.Array | float = 1.0,
    length: jax.Array | None = None,
    squared_joins: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Greedy online selection (reference's greedy_search variant,
    SURVEY.md §2 row 11 [M]): at each step pick the candidate minimising
    target + join-from-previous-choice, using only the running context."""
    T, N = target_costs.shape
    jcw = jnp.float32(join_cost_weight)
    t_idx = jnp.arange(T, dtype=jnp.int32)
    live = jnp.ones((T,), bool) if length is None else (t_idx < length)
    tc = jnp.where(live[:, None], target_costs, 0.0)

    first = jnp.argmin(tc[0]).astype(jnp.int32)
    init_ctx = join_right[0, first]
    init_cost = tc[0, first]

    def step(carry, inputs):
        ctx, acc = carry
        tc_t, jl_t, jr_t, live_t = inputs
        d = jnp.maximum(jnp.sum((jl_t - ctx[None, :]) ** 2, axis=-1), 0.0)
        if not squared_joins:
            d = jnp.sqrt(d)
        total = tc_t + jnp.where(live_t, jcw * d, 0.0)
        choice = jnp.argmin(total).astype(jnp.int32)
        return (jr_t[choice], acc + total[choice]), choice

    (_, total_cost), rest = jax.lax.scan(
        step, (init_ctx, init_cost), (tc[1:], join_left[1:], join_right[1:], live[1:])
    )
    path = jnp.concatenate([first[None], rest]) if T > 1 else first[None]
    return path.astype(jnp.int32), total_cost
