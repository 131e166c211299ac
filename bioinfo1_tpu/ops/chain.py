"""LIS chaining of seed matches, batched on device.

Re-design of FindLIS (team_mapper.cpp:283-316): the reference runs an O(n^2)
scalar DP per read on one CPU thread.  Here the DP keeps its sequential outer
loop (a true dependency) but the inner maximisation is a masked vector
reduction over all predecessors, batched over every read in the batch - one
``fori_loop`` step processes a (B, N) tile on the VPU.

Predecessor rule (with the reference's unsigned-wrap semantics folded in,
see reference_model.find_lis): j < i qualifies iff
    r_j < r_i < r_j + 5000   and   f_j < f_i < f_j + 5000.
``prev[i]`` is the smallest qualifying j with maximal lis[j]; the chain end
is the first argmax of lis; chain length equals lis[end].

Only the chain's endpoints are needed downstream (region extraction uses
chain.front() / chain.back(), team_mapper.cpp:653-656), so the backtrack
reduces to root-finding via pointer chasing.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_GAP_CAP = 5000


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChainResult:
    """Per-read chain summary for one strand.

    length: (B,) int32 chain length (0 when the read had no matches).
    q_start/q_end/t_start/t_end: (B,) int32 1-based minimizer positions of
    chain.front() and chain.back() (query and target axes).
    """

    length: jax.Array
    q_start: jax.Array
    q_end: jax.Array
    t_start: jax.Array
    t_end: jax.Array


@jax.jit
def lis_chain(f_pos: jax.Array, r_pos: jax.Array, count: jax.Array) -> ChainResult:
    """Batched LIS over (B, N) match arrays with ``count`` valid per row."""
    B, N = f_pos.shape
    j_idx = jnp.arange(N, dtype=jnp.int32)
    valid = j_idx[None, :] < count[:, None]          # (B, N)
    f = f_pos.astype(jnp.int32)
    r = r_pos.astype(jnp.int32)

    def step(i, state):
        lis, prev = state
        fi = jax.lax.dynamic_slice_in_dim(f, i, 1, axis=1)      # (B, 1)
        ri = jax.lax.dynamic_slice_in_dim(r, i, 1, axis=1)
        vi = jax.lax.dynamic_slice_in_dim(valid, i, 1, axis=1)
        mask = ((j_idx[None, :] < i) & valid & vi
                & (r < ri) & (ri - r < _GAP_CAP)
                & (f < fi) & (fi - f < _GAP_CAP))
        cand = jnp.where(mask, lis, 0)
        best = jnp.max(cand, axis=1)                             # (B,)
        has = best > 0
        new_lis_i = jnp.where(has, best + 1, 1)
        first_j = jnp.min(
            jnp.where(mask & (lis == best[:, None]), j_idx[None, :], N),
            axis=1)
        new_prev_i = jnp.where(has, first_j, -1)
        lis = jax.lax.dynamic_update_slice_in_dim(
            lis, new_lis_i[:, None], i, axis=1)
        prev = jax.lax.dynamic_update_slice_in_dim(
            prev, new_prev_i[:, None], i, axis=1)
        return lis, prev

    lis0 = jnp.ones((B, N), dtype=jnp.int32)
    prev0 = jnp.full((B, N), -1, dtype=jnp.int32)
    # i = 0 keeps lis=1, prev=-1 (the reference starts its outer loop at 1).
    lis, prev = jax.lax.fori_loop(1, N, step, (lis0, prev0))

    masked_lis = jnp.where(valid, lis, 0)
    end = jnp.argmax(masked_lis, axis=1).astype(jnp.int32)  # first argmax
    length = jnp.max(masked_lis, axis=1)

    # Root-finding: chase prev pointers from the chain end.
    rows = jnp.arange(B)

    def cond(state):
        cur, _ = state
        return jnp.any(prev[rows, cur] >= 0)

    def body(state):
        cur, steps = state
        nxt = prev[rows, cur]
        return jnp.where(nxt >= 0, nxt, cur), steps + 1

    root, _ = jax.lax.while_loop(cond, body, (end, jnp.int32(0)))

    return ChainResult(
        length=length,
        q_start=f[rows, root], q_end=f[rows, end],
        t_start=r[rows, root], t_end=r[rows, end])
