"""Pallas TPU wavefront alignment kernel (score path).

Same contract as ops.align.align_batch with want_parents=False: batched
NW / SW / semi-global DP scores + goal cells.  The lax implementation runs
the anti-diagonal sweep as a lax.scan - n+m dispatches of tiny fused ops,
dominated by per-step overhead on TPU.  This kernel runs the WHOLE sweep
inside one pallas_call: the two live diagonals, the reversed target slice,
and the per-lane gap costs stay in VMEM scratch across a fori_loop, so each
wavefront step is a handful of VPU ops with zero dispatch cost.

Layout: grid over batch tiles of BT=8 reads (int32 sublane tile); lanes hold
the query axis (n+1 padded to a multiple of 128).  VMEM footprint is
~5 * BT * n1 * 4B - under 1 MB for 16 kb regions.

Score-only is exact for PAF emission (the reference prints the DP score in
column 10, team_mapper.cpp:691); M>I>D tie priority only affects traceback,
which the -c path gets from ops.align with want_parents=True.

Reference semantics preserved: linear gap, literal '-' costs 0
(team_alignment.cpp:25-28), goal rules per mode (team_alignment.cpp:117-118,
185-192, 265-278).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bioinfo1_tpu.ops.align import (AlignOut, MODE_GLOBAL, MODE_LOCAL,
                                    MODE_SEMIGLOBAL)

_NEG = -(2**31) + 2   # plain int: jnp scalars become captured constants in pallas
_BT = 8          # batch rows per program (int32 sublane tile)
_DASH = 45       # ord('-')


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(mode, n1, m_len, q_ref, ql_ref, t_ref, tl_ref, prm_ref,
            score_ref, gi_ref, gj_ref,
            h2_s, h1_s, tdiag_s, tchunk_s):
    """One batch tile: full wavefront sweep d = 2 .. n1-1 + m_len."""
    match = prm_ref[0, 0]
    mismatch = prm_ref[0, 1]
    gap = prm_ref[0, 2]
    init = jnp.where(mode == MODE_GLOBAL, gap, 0).astype(jnp.int32)

    q = q_ref[...].astype(jnp.int32)                 # (BT, n1) lane i = q[i-1]
    ql = ql_ref[...].astype(jnp.int32)               # (BT, 1)
    tl = tl_ref[...].astype(jnp.int32)               # (BT, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_BT, n1), 1)
    del_cost = jnp.where(q == _DASH, 0, gap).astype(jnp.int32)

    # Diagonal d=0: H(0,0)=0.  Diagonal d=1: lane0=(0,1), lane1=(1,0).
    h2_s[...] = jnp.zeros((_BT, n1), jnp.int32)
    h1_s[...] = jnp.where(lanes <= 1, init, 0).astype(jnp.int32)
    t0 = t_ref[:, 0:1].astype(jnp.int32)             # t[0] for cell (0,1)
    tdiag_s[...] = jnp.where(lanes == 0, t0, 0).astype(jnp.int32)

    neg = jnp.full((_BT, 1), _NEG, jnp.int32)
    zero = jnp.zeros((_BT, 1), jnp.int32)
    # carry: score, (local best cost,i,j), (semi col cost,i), (semi row cost,j)
    carry0 = (zero, neg, zero, zero, zero, zero, zero, zero)

    lanes128 = jax.lax.broadcasted_iota(jnp.int32, (_BT, 128), 1)

    def step(d, carry):
        score, bc, bi, bj, cc, ci, rc, rj = carry
        # tdiag[i] = t[d-1-i]: shift lanes right, inject t[d-1] at lane 0.
        # Mosaic only allows 128-aligned dynamic lane loads, so t streams
        # through a 128-lane staging chunk refreshed every 128 steps; the
        # in-chunk byte is picked by masked reduction.
        pos = jnp.clip(d - 1, 0, m_len - 1)
        off = jax.lax.rem(pos, 128)
        base = pl.multiple_of(pos - off, 128)

        @pl.when(jnp.logical_or(off == 0, d == 2))
        def _():
            tchunk_s[...] = t_ref[:, pl.ds(base, 128)]

        tnew = jnp.sum(
            jnp.where(lanes128 == off, tchunk_s[...].astype(jnp.int32), 0),
            axis=1, keepdims=True)
        tprev = tdiag_s[...]
        tdiag = jnp.where(
            lanes == 0, tnew, pltpu.roll(tprev, shift=1, axis=1))
        tdiag_s[...] = tdiag

        h2 = h2_s[...]
        h1 = h1_s[...]
        sub = jnp.where(q == tdiag, match, mismatch)
        ins_cost = jnp.where(tdiag == _DASH, 0, gap)

        diag_v = pltpu.roll(h2, shift=1, axis=1) + sub
        up_v = pltpu.roll(h1, shift=1, axis=1) + del_cost
        left_v = h1 + ins_cost
        h = jnp.maximum(jnp.maximum(diag_v, left_v), up_v)
        h = jnp.where(lanes == 0, d * init, h)       # cell (0, d)
        h = jnp.where(lanes == d, lanes * init, h)   # cell (d, 0)
        if mode == MODE_LOCAL:
            h = jnp.maximum(h, 0)

        if mode == MODE_GLOBAL:
            hit = d == (ql + tl)                      # (BT, 1)
            val = jnp.sum(jnp.where(lanes == ql, h, 0), axis=1, keepdims=True)
            score = jnp.where(hit, val, score)
        elif mode == MODE_LOCAL:
            in_diag = ((lanes >= 1) & (lanes <= ql)
                       & ((d - lanes) >= 1) & ((d - lanes) <= tl))
            cand = jnp.where(in_diag, h, _NEG)
            c = jnp.max(cand, axis=1, keepdims=True)
            cil = jnp.min(jnp.where(cand == c, lanes, n1), axis=1,
                          keepdims=True)
            cjl = d - cil
            take = (c > bc) | ((c == bc) & ((cil < bi)
                                            | ((cil == bi) & (cjl < bj))))
            bc = jnp.where(take, c, bc)
            bi = jnp.where(take, cil, bi)
            bj = jnp.where(take, cjl, bj)
        else:  # semiGlobal rim tracking
            i_col = d - tl
            v_col = jnp.sum(jnp.where(lanes == i_col, h, 0), axis=1,
                            keepdims=True)
            ok_col = (i_col >= 0) & (i_col <= ql)
            take = ok_col & (v_col > cc)
            cc = jnp.where(take, v_col, cc)
            ci = jnp.where(take, i_col, ci)
            j_row = d - ql
            v_row = jnp.sum(jnp.where(lanes == ql, h, 0), axis=1,
                            keepdims=True)
            ok_row = (j_row >= 0) & (j_row <= tl)
            take = ok_row & (v_row > rc)
            rc = jnp.where(take, v_row, rc)
            rj = jnp.where(take, j_row, rj)

        h2_s[...] = h1
        h1_s[...] = h
        return (score, bc, bi, bj, cc, ci, rc, rj)

    n_steps = (n1 - 1) + m_len - 1                    # d = 2 .. n1-1+m_len
    # Every goal rule (corner / in-matrix argmax / rim) only reads cells
    # with d <= ql + tl, so the sweep stops at the tile's largest (dynamic
    # bound; padded rows have ql = tl = 0).
    d_stop = jnp.minimum(jnp.max(ql + tl), n_steps + 1)
    score, bc, bi, bj, cc, ci, rc, rj = jax.lax.fori_loop(
        2, d_stop + 1, step, carry0)

    if mode == MODE_GLOBAL:
        score_ref[...] = score
        gi_ref[...] = ql
        gj_ref[...] = tl
    elif mode == MODE_LOCAL:
        hit = bc > _NEG
        score_ref[...] = jnp.where(hit, bc, 0)
        gi_ref[...] = jnp.where(hit, bi, 0)
        gj_ref[...] = jnp.where(hit, bj, 0)
    else:
        row_wins = rc > cc
        score_ref[...] = jnp.where(row_wins, rc, cc)
        gi_ref[...] = jnp.where(row_wins, ql, ci)
        gj_ref[...] = jnp.where(row_wins, rj, tl)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def align_scores(q_bytes: jax.Array, q_lens: jax.Array,
                 t_bytes: jax.Array, t_lens: jax.Array,
                 mode: int, match: jax.Array, mismatch: jax.Array,
                 gap: jax.Array, interpret: bool = False) -> AlignOut:
    """Pallas score-only alignment; drop-in for align_batch(want_parents=False).

    Args mirror ops.align.align_batch.  ``interpret=True`` runs the kernel in
    the Pallas interpreter (for CPU tests).
    """
    B, n = q_bytes.shape
    m = t_bytes.shape[1]
    n1_pad = _round_up(n + 1, 128)
    b_pad = _round_up(max(B, _BT), _BT)

    # Lane i carries q[i-1]; lane 0 is the boundary row.
    q_sh = jnp.zeros((b_pad, n1_pad), dtype=jnp.uint8)
    q_sh = q_sh.at[:B, 1:n + 1].set(q_bytes)
    t_p = jnp.zeros((b_pad, _round_up(max(m, 128), 128)), dtype=jnp.uint8)
    t_p = t_p.at[:B, :m].set(t_bytes)
    ql = jnp.zeros((b_pad, 1), jnp.int32).at[:B, 0].set(
        q_lens.astype(jnp.int32))
    tl = jnp.zeros((b_pad, 1), jnp.int32).at[:B, 0].set(
        t_lens.astype(jnp.int32))
    prm = jnp.array([[match, mismatch, gap]], dtype=jnp.int32)

    m_len = t_p.shape[1]
    kernel = functools.partial(_kernel, mode, n1_pad, m_len)
    grid = (b_pad // _BT,)
    out_shape = [jax.ShapeDtypeStruct((b_pad, 1), jnp.int32)] * 3
    row_spec = pl.BlockSpec((_BT, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    score, gi, gj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BT, n1_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            pl.BlockSpec((_BT, m_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[row_spec] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((_BT, n1_pad), jnp.int32),
            pltpu.VMEM((_BT, n1_pad), jnp.int32),
            pltpu.VMEM((_BT, n1_pad), jnp.int32),
            pltpu.VMEM((_BT, 128), jnp.uint8),
        ],
        interpret=interpret,
    )(q_sh, ql, t_p, tl, prm)

    return AlignOut(score=score[:B, 0], goal_i=gi[:B, 0], goal_j=gj[:B, 0],
                    parents=jnp.zeros((0, 0, 0), dtype=jnp.uint32))
