"""Pallas TPU kernel for LIS chaining (same contract as ops.chain.lis_chain).

The lax implementation runs the O(N^2) LIS DP as a fori_loop of N tiny
dispatches plus a pointer-chasing while_loop - all dominated by per-step
overhead on TPU.  Here the whole DP, the argmax, and the backtrack run
inside one pallas_call with the match arrays resident in VMEM.

Semantics identical to ops.chain.lis_chain (and reference_model.find_lis,
team_mapper.cpp:283-316): predecessor rule r_j < r_i < r_j+5000 and
f_j < f_i < f_j+5000, strict improvement (earliest qualifying j wins),
chain end = first argmax, only the chain's endpoints are reported.

Two-level chunked DP (r05; the flat column-at-a-time DP paid ~20 (BT, N)
vector passes PER COLUMN - O(N^2) work with a 20x constant):

  * (lis, prev) state is PACKED into one int32 per match:
    (lis << 16) | (0xFFFF - j).  An unmasked max over packed values picks
    the highest lis and, among ties, the SMALLEST index - the reference's
    earliest-qualifying-j rule - in one reduction, and the winning
    predecessor index falls out of the low bits with no argmin pass.
  * CROSS-chunk contributions (predecessors in finished chunks) are
    evaluated per read as dense (C, C) 2-D ops - candidate j on lanes,
    column c on sublanes - so the O(N^2) pair work runs at full VPU width
    instead of one column per serial step.  Chunks whose query-position
    span cannot intersect the 5000 window are skipped exactly (per-chunk
    f min/max bounds): ONT reads span ~2 windows, so most chunk pairs
    vanish.
  * WITHIN-chunk columns keep the serial scan (a true dependency) but on
    (BT, C) slices with rolled column extraction - ~20 passes over C=256
    lanes instead of over the whole budget N.
  * the backtrack walks prev chunk-by-chunk in descending order ((BT, C)
    masked selects), never touching the full (BT, N) row per step.

Measured: 126 -> ~20 ms for the repeat-genome chain stage at budget 6144
(mean 2.3k matches/read), ~2x at normal E. coli counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bioinfo1_tpu.ops.chain import ChainResult

_GAP_CAP = 5000
_JMASK = 0xFFFF          # packed low-bits field; requires n_pad <= 0x10000


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(n, C, BT, f_ref, r_ref, cnt_ref, len_ref, qs_ref, qe_ref,
            ts_ref, te_ref, lis_s, prev_s, stat_s, ext_s):
    K = n // C
    f = f_ref[...].astype(jnp.int32)
    r = r_ref[...].astype(jnp.int32)
    cnt = cnt_ref[...].astype(jnp.int32)          # (BT, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BT, n), 1)
    loc = jax.lax.broadcasted_iota(jnp.int32, (BT, C), 1)
    valid = lanes < cnt

    # Packed init: every match alone is a chain of length 1.
    lis_s[...] = (1 << 16) | (_JMASK - lanes)
    prev_s[...] = jnp.full((BT, n), -1, jnp.int32)

    # Per-chunk query-position bounds over VALID lanes, for the exact
    # cross-chunk expiry skip (rows 0..K-1 = min, K..2K-1 = max).
    BIG = jnp.int32(2**30)
    fv_min = jnp.where(valid, f, BIG)
    fv_max = jnp.where(valid, f, -BIG)
    mins = [jnp.min(fv_min[:, q * C:(q + 1) * C], axis=1, keepdims=True)
            for q in range(K)]
    maxs = [jnp.max(fv_max[:, q * C:(q + 1) * C], axis=1, keepdims=True)
            for q in range(K)]
    pad = stat_s.shape[1] - 2 * K
    stat_s[...] = jnp.concatenate(
        mins + maxs + [jnp.zeros((BT, pad), jnp.int32)], axis=1)

    n_iter = jnp.minimum(jnp.max(cnt), n)
    k_eff = pl.cdiv(n_iter, C)

    jloc = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    def chunk_body(k, _):
        kC = pl.multiple_of(k * C, C)

        # ---- cross phase: best finished predecessor per column ----
        ext_s[...] = jnp.zeros((BT, C), jnp.int32)

        def cross_row(b, _):
            cnt_b = cnt_ref[b, 0]

            @pl.when((k > 0) & (cnt_b > kC))
            def _():
                fcT = jnp.swapaxes(f_ref[pl.ds(b, 1), pl.ds(kC, C)]
                                   .astype(jnp.int32), 0, 1)      # (C, 1)
                rcT = jnp.swapaxes(r_ref[pl.ds(b, 1), pl.ds(kC, C)]
                                   .astype(jnp.int32), 0, 1)
                # Exact expiry skip: chunk q can contribute only if some
                # f_j may fall in (f_c - 5000, f_c) for some column c.
                # Matches are emitted in query order, so the qualifying q
                # form a (near-)contiguous suffix of [0, k): loop from the
                # smallest qualifying q instead of testing each (the mask
                # keeps stragglers exact either way).
                srow = stat_s[pl.ds(b, 1), :]                     # (1, SW)
                sl = jax.lax.broadcasted_iota(jnp.int32, srow.shape, 1)
                fmin_k = jnp.sum(jnp.where(sl == k, srow, 0))
                fmax_k = jnp.sum(jnp.where(sl == K + k, srow, 0))
                maxs0 = pltpu.roll(srow, shift=srow.shape[1] - K, axis=1)
                ok = ((sl < k) & (maxs0 > fmin_k - _GAP_CAP)
                      & (srow < fmax_k))
                q_lo = jnp.min(jnp.where(ok, sl, K))

                def cross_q(q, acc):
                    qC = pl.multiple_of(q * C, C)
                    fj = f_ref[pl.ds(b, 1), pl.ds(qC, C)].astype(
                        jnp.int32)                                # (1, C)
                    rj = r_ref[pl.ds(b, 1), pl.ds(qC, C)].astype(
                        jnp.int32)
                    pj = lis_s[pl.ds(b, 1), pl.ds(qC, C)]
                    vj = (jloc + qC) < cnt_b
                    mask = (vj & (fj < fcT) & (fcT - fj < _GAP_CAP)
                            & (rj < rcT) & (rcT - rj < _GAP_CAP))
                    cand = jnp.where(mask, pj, 0)
                    return jnp.maximum(
                        acc, jnp.max(cand, axis=1, keepdims=True))

                acc = jax.lax.fori_loop(
                    jnp.minimum(q_lo, k), k, cross_q,
                    jnp.zeros((C, 1), jnp.int32))
                ext_s[pl.ds(b, 1), :] = jnp.swapaxes(acc, 0, 1)

            return 0

        jax.lax.fori_loop(0, BT, cross_row, 0)

        # ---- within-chunk serial scan on (BT, C) slices ----
        cf = f_ref[:, pl.ds(kC, C)].astype(jnp.int32)
        cr = r_ref[:, pl.ds(kC, C)].astype(jnp.int32)
        lis_c0 = lis_s[:, pl.ds(kC, C)]
        prev_c0 = prev_s[:, pl.ds(kC, C)]
        ext0 = ext_s[...]
        vj_glob = (loc + kC) < cnt                  # (BT, C)
        hi = jnp.clip(n_iter - kC, 0, C)

        def col(i, carry):
            cfr, crr, extr, lis_c, prev_c = carry
            fi = cfr[:, 0:1]
            ri = crr[:, 0:1]
            eki = extr[:, 0:1]
            vi = (kC + i) < cnt
            mask = ((loc < i) & vj_glob & vi
                    & (cr < ri) & (ri - cr < _GAP_CAP)
                    & (cf < fi) & (fi - cf < _GAP_CAP))
            binc = jnp.max(jnp.where(mask, lis_c, 0), axis=1, keepdims=True)
            best = jnp.maximum(binc, jnp.where(vi, eki, 0))
            has = best > 0
            new_lis = jnp.where(has, (best >> 16) + 1, 1)
            new_prev = jnp.where(has, _JMASK - (best & _JMASK), -1)
            packed = (new_lis << 16) | (_JMASK - (kC + i))
            colm = loc == i
            lis_c = jnp.where(colm, packed, lis_c)
            prev_c = jnp.where(colm, new_prev, prev_c)
            return (pltpu.roll(cfr, shift=C - 1, axis=1),
                    pltpu.roll(crr, shift=C - 1, axis=1),
                    pltpu.roll(extr, shift=C - 1, axis=1),
                    lis_c, prev_c)

        carry = (cf, cr, ext0, lis_c0, prev_c0)
        carry = jax.lax.fori_loop(0, hi, col, carry)
        lis_s[:, pl.ds(kC, C)] = carry[3]
        prev_s[:, pl.ds(kC, C)] = carry[4]
        return 0

    jax.lax.fori_loop(0, k_eff, chunk_body, 0)

    # ---- result extraction ----
    packed = jnp.where(valid, lis_s[...], 0)
    pmax = jnp.max(packed, axis=1, keepdims=True)         # (BT, 1)
    have = pmax > 0
    length = jnp.where(have, pmax >> 16, 0)
    end = jnp.where(have, _JMASK - (pmax & _JMASK), 0)

    # ---- chunked backtrack: prev pointers only ever decrease ----
    def bt_chunk(t, carry):
        cur, done = carry
        cc = k_eff - 1 - t

        def walk(carry):
            cur, done = carry
            base = cc * C
            in_c = (cur >= base) & (done == 0)
            m = in_c & (loc == cur - base)
            pch = prev_s[:, pl.ds(pl.multiple_of(base, C), C)]
            pv = jnp.sum(jnp.where(m, pch, 0), axis=1, keepdims=True)
            done = jnp.where(in_c & (pv < 0), 1, done)
            cur = jnp.where(in_c & (pv >= 0), pv, cur)
            return cur, done

        def cond(carry):
            cur, done = carry
            return jnp.any((cur >= cc * C) & (done == 0))

        return jax.lax.cond(
            cc >= 0, lambda c: jax.lax.while_loop(cond, walk, c),
            lambda c: c, (cur, done))

    root, _ = jax.lax.fori_loop(
        0, K, bt_chunk, (end, jnp.zeros((BT, 1), jnp.int32)))

    def sel(arr, idx):
        return jnp.sum(jnp.where(lanes == idx, arr, 0), axis=1,
                       keepdims=True)

    len_ref[...] = length
    qs_ref[...] = sel(f, root)
    qe_ref[...] = sel(f, end)
    ts_ref[...] = sel(r, root)
    te_ref[...] = sel(r, end)


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
    # Chunk width: n_pad is a multiple of C, and C caps the serial scan's
    # vector width.  128 keeps tiny test shapes single-chunk.
    C = 128 if N <= 128 else 256
    n_pad = _round_up(max(N, C), C)
    if n_pad > _JMASK + 1:
        raise ValueError(f"match budget {N} exceeds packed-index range "
                         f"{_JMASK + 1}")
    # Tile height under a VMEM budget: f/r inputs + lis/prev scratch are 4
    # (BT, n_pad) int32 rows, but Mosaic's scoped stack also holds the
    # init-phase temporaries (masked f copies, per-chunk min/max builds) -
    # measured ~10 int32 words per element total (22.7M scoped at BT=32,
    # n_pad=18432), so budget for that, not just the named buffers.
    BT = 64
    while BT > 8 and 10 * BT * n_pad * 4 > 14e6:
        BT //= 2
    b_pad = _round_up(max(B, BT), BT)
    f = jnp.zeros((b_pad, n_pad), jnp.int32).at[:B, :N].set(
        f_pos.astype(jnp.int32))
    r = jnp.zeros((b_pad, n_pad), jnp.int32).at[:B, :N].set(
        r_pos.astype(jnp.int32))
    c = jnp.zeros((b_pad, 1), jnp.int32).at[:B, 0].set(
        count.astype(jnp.int32))

    kernel = functools.partial(_kernel, n_pad, C, BT)
    grid = (b_pad // BT,)
    vec_spec = pl.BlockSpec((BT, n_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((BT, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    K = n_pad // C
    stat_w = _round_up(max(2 * K, 128), 128)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec_spec, vec_spec, row_spec],
        out_specs=[row_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((b_pad, 1), jnp.int32)] * 5,
        scratch_shapes=[
            pltpu.VMEM((BT, n_pad), jnp.int32),      # packed lis
            pltpu.VMEM((BT, n_pad), jnp.int32),      # prev
            pltpu.VMEM((BT, stat_w), jnp.int32),     # chunk f min/max
            pltpu.VMEM((BT, C), jnp.int32),          # cross-chunk best
        ],
        interpret=interpret,
    )(f, r, c)
    length, qs, qe, ts, te = [o[:B, 0] for o in outs]
    return ChainResult(length=length, q_start=qs, q_end=qe,
                       t_start=ts, t_end=te)
