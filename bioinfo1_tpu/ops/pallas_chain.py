"""Pallas TPU kernel for LIS chaining (same contract as ops.chain.lis_chain).

The lax implementation runs the O(N^2) LIS DP as a fori_loop of N tiny
dispatches plus a pointer-chasing while_loop - all dominated by per-step
overhead on TPU.  Here the whole DP, the argmax, and the backtrack run
inside one pallas_call with the match arrays resident in VMEM.

Semantics identical to ops.chain.lis_chain (and reference_model.find_lis,
team_mapper.cpp:283-316): predecessor rule r_j < r_i < r_j+5000 and
f_j < f_i < f_j+5000, strict improvement (earliest qualifying j wins),
chain end = first argmax, only the chain's endpoints are reported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bioinfo1_tpu.ops.chain import ChainResult

_GAP_CAP = 5000
# Tile height: the DP is a serial per-iteration loop whose overhead
# dominates at narrow tiles; 64 rows halves the iteration count for the
# same vector work while staying inside VMEM ((64, N) int32 buffers).
_BT = 64


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lane_select(arr, idx):
    """arr[(row, idx[row])] as (BT, 1) via masked reduction (per-row dynamic
    lane gathers are not vectorizable on TPU; a compare+sum is)."""
    n = arr.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    return jnp.sum(jnp.where(lanes == idx, arr, 0), axis=1, keepdims=True)


def _kernel(n, f_ref, r_ref, cnt_ref, len_ref, qs_ref, qe_ref, ts_ref,
            te_ref, lis_s, prev_s):
    f = f_ref[...].astype(jnp.int32)
    r = r_ref[...].astype(jnp.int32)
    cnt = cnt_ref[...].astype(jnp.int32)          # (BT, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_BT, n), 1)
    valid = lanes < cnt

    lis_s[...] = jnp.ones((_BT, n), jnp.int32)
    prev_s[...] = jnp.full((_BT, n), -1, jnp.int32)

    def step(i, _):
        lis = lis_s[...]
        fi = _lane_select(f, i)
        ri = _lane_select(r, i)
        vi = (i < cnt)
        mask = ((lanes < i) & valid & vi
                & (r < ri) & (ri - r < _GAP_CAP)
                & (f < fi) & (fi - f < _GAP_CAP))
        cand = jnp.where(mask, lis, 0)
        best = jnp.max(cand, axis=1, keepdims=True)
        has = best > 0
        first_j = jnp.min(jnp.where(mask & (lis == best), lanes, n),
                          axis=1, keepdims=True)
        new_lis = jnp.where(has, best + 1, 1)
        new_prev = jnp.where(has, first_j, -1)
        # Write column i.
        col = lanes == i
        lis_s[...] = jnp.where(col, new_lis, lis)
        prev_s[...] = jnp.where(col, new_prev, prev_s[...])
        return 0

    # Iterations beyond the tile's largest match count are no-ops (the vi
    # mask kills them); bounding the loop there makes near-empty tiles -
    # e.g. the wrong-strand chain of every read - finish immediately.
    n_iter = jnp.minimum(jnp.max(cnt), n)
    jax.lax.fori_loop(1, n_iter, step, 0)

    lis = jnp.where(valid, lis_s[...], 0)
    prev = prev_s[...]
    length = jnp.max(lis, axis=1, keepdims=True)
    end = jnp.min(jnp.where(lis == length, lanes, n), axis=1, keepdims=True)
    end = jnp.where(length > 0, end, 0)

    def cond(state):
        cur, _ = state
        nxt = _lane_select(prev, cur)
        return jnp.any(nxt >= 0)

    def body(state):
        cur, it = state
        nxt = _lane_select(prev, cur)
        return jnp.where(nxt >= 0, nxt, cur), it + 1

    root, _ = jax.lax.while_loop(
        cond, body, (end, jnp.zeros((), jnp.int32)))

    len_ref[...] = length
    qs_ref[...] = _lane_select(f, root)
    qe_ref[...] = _lane_select(f, end)
    ts_ref[...] = _lane_select(r, root)
    te_ref[...] = _lane_select(r, end)


def _permute_rows(arr: jax.Array, order: jax.Array) -> jax.Array:
    """arr[order, :] as a sliced gather (contiguous rows are cheap; a plain
    arr[order] lowers to an element-serial gather on TPU)."""
    B, N = arr.shape
    starts = jnp.stack([order.astype(jnp.int32),
                        jnp.zeros((order.shape[0],), jnp.int32)], axis=1)
    return jax.lax.gather(
        arr, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1)),
        slice_sizes=(1, N), mode="clip")


@functools.partial(jax.jit, static_argnames=("interpret",))
def lis_chain_sorted(f_pos: jax.Array, r_pos: jax.Array, count: jax.Array,
                     interpret: bool = False) -> ChainResult:
    """lis_chain with rows processed in descending match-count order.

    The kernel's serial DP loop runs to each TILE's max count; unsorted
    batches mix near-empty rows (the wrong-strand chain of every read)
    into every tile, making all tiles pay the global max.  Sorting rows by
    count makes tiles homogeneous, so empty-ish tiles finish immediately -
    ~2x on the fwd+rev fused batch.  Results are scattered back to input
    order; output is identical to lis_chain."""
    B, N = f_pos.shape
    order = jnp.argsort(-count.astype(jnp.int32))
    res = lis_chain(_permute_rows(f_pos, order),
                    _permute_rows(r_pos, order),
                    count[order], interpret=interpret)
    inv = jnp.zeros((B,), jnp.int32).at[order].set(
        jnp.arange(B, dtype=jnp.int32))
    return ChainResult(length=res.length[inv], q_start=res.q_start[inv],
                       q_end=res.q_end[inv], t_start=res.t_start[inv],
                       t_end=res.t_end[inv])


@functools.partial(jax.jit, static_argnames=("interpret",))
def lis_chain(f_pos: jax.Array, r_pos: jax.Array, count: jax.Array,
              interpret: bool = False) -> ChainResult:
    """Pallas drop-in for ops.chain.lis_chain."""
    B, N = f_pos.shape
    n_pad = _round_up(max(N, 128), 128)
    b_pad = _round_up(max(B, _BT), _BT)
    f = jnp.zeros((b_pad, n_pad), jnp.int32).at[:B, :N].set(
        f_pos.astype(jnp.int32))
    r = jnp.zeros((b_pad, n_pad), jnp.int32).at[:B, :N].set(
        r_pos.astype(jnp.int32))
    c = jnp.zeros((b_pad, 1), jnp.int32).at[:B, 0].set(
        count.astype(jnp.int32))

    kernel = functools.partial(_kernel, n_pad)
    grid = (b_pad // _BT,)
    vec_spec = pl.BlockSpec((_BT, n_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((_BT, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec_spec, vec_spec, row_spec],
        out_specs=[row_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((b_pad, 1), jnp.int32)] * 5,
        scratch_shapes=[
            pltpu.VMEM((_BT, n_pad), jnp.int32),
            pltpu.VMEM((_BT, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(f, r, c)
    length, qs, qe, ts, te = [o[:B, 0] for o in outs]
    return ChainResult(length=length, q_start=qs, q_end=qe,
                       t_start=ts, t_end=te)
