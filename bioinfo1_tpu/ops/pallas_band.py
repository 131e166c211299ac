"""Banded Pallas wavefront alignment (global mode) with exactness certificate.

The full wavefront kernel (ops/pallas_align.py) sweeps n+m anti-diagonals of
n+1 lanes each.  For chained read regions the optimal global path stays near
the main diagonal, so almost all of that work scores cells no optimal path
can touch.  This kernel keeps only a fixed band of W diagonals live.

Coordinates: anti-diagonal d = i + j, diagonal offset o = j - i.  On a given
d only offsets with o == d (mod 2) exist, so W lanes cover the 2W-wide
offset window [-W, W-2]: lane l holds offset o = 2l - W + (d & 1).  The DP
recurrence in (d, o) space has FIXED lane shifts (no per-read band steering):

    H_d[o] = max(H_{d-2}[o] + sub, H_{d-1}[o+1] + del, H_{d-1}[o-1] + ins)

with the up/left neighbours landing at lane l / l-1 on even d and l+1 / l on
odd d.  Query and target bytes stream through the band one lane per two
steps (query enters at lane 0, target at lane W-1), staged via 128-aligned
chunks as in the full kernel.

Exactness: a global path that leaves the band must reach |o| >= W-1, which
costs at least 2*(W-1) - |m-n| indels, so its score is at most

    bound = max(match, mismatch, 0) * min(n, m) + gap * (2*(W-1) - |m-n|)

(valid when gap <= 0 and no literal '-' bytes, which make some gaps free,
team_alignment.cpp:25-28).  If the banded score >= bound, no out-of-band
path can beat it and the result equals the full DP's (ties only ever tie
the score, which is all this path emits).  `certify()` returns that flag;
pipeline/device_map.py falls back to the full kernel for uncertified reads.

Reference semantics preserved: linear gap, raw byte compare, global borders
H(0,j)=j*gap / H(i,0)=i*gap, goal cell (n, m) (team_alignment.cpp:83-118).
Score-only, like the full Pallas kernel: PAF column 10 is the DP score
(team_mapper.cpp:691); -c traceback goes through ops/align.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bioinfo1_tpu.ops.align import AlignOut

_NEG = -(2**30)      # invalid-cell fill; safe against +gap underflow
_DASH = 45           # ord('-')


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(W, BT, n_len, m_len, n_steps, want_parents, CH, mode, dash_free,
            q_ref, ql_ref, t_ref, tl_ref, qd0_ref, td0_ref, prm_ref,
            score_ref, gi_ref, gj_ref, par_ref,
            h2_s, h1_s, qd_s, td_s, qchunk_s, tchunk_s, pbuf_s, dma_sem):
    match = prm_ref[0, 0]
    mismatch = prm_ref[0, 1]
    gap = prm_ref[0, 2]
    # Borders: global i*gap / local+semiGlobal zero (team_alignment.cpp:62-71).
    init = gap if mode == 0 else jnp.int32(0)
    tile = pl.program_id(0)

    ql = ql_ref[...].astype(jnp.int32)                     # (BT, 1)
    tl = tl_ref[...].astype(jnp.int32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    lanes128 = jax.lax.broadcasted_iota(jnp.int32, (BT, 128), 1)
    half = W // 2

    # d=0: only cell (0,0)=0 at lane W/2.  d=1: (0,1) at lane W/2 and (1,0)
    # at lane W/2-1, both = gap under global borders.
    h2_s[...] = jnp.where(lanes == half, 0, _NEG).astype(jnp.int32)
    h1_s[...] = jnp.where((lanes == half) | (lanes == half - 1),
                          init, _NEG).astype(jnp.int32)
    qd_s[...] = qd0_ref[...].astype(jnp.int32)
    td_s[...] = td0_ref[...].astype(jnp.int32)

    def chunk_byte(chunk_s, off):
        return jnp.sum(
            jnp.where(lanes128 == off, chunk_s[...].astype(jnp.int32), 0),
            axis=1, keepdims=True)

    def make_pair(borders, goal):
        """Two anti-diagonals per fori_loop iteration with STATIC parity.
        The per-step parity selects (qd/td shift gating, up/left neighbour
        choice) and half the chunk-byte extractions (q consumed on even d
        only, t on odd only) drop out, and loop overhead halves.  Safe
        because i0 is identical within an (even, odd) pair and the target
        byte index first crosses a 128-chunk boundary on the odd step, so
        staging q on even / t on odd sub-steps preserves the streaming
        sequence exactly."""
        def pair(e, carry):
            d0 = 2 * e
            carry = step(borders, goal, 0, d0, carry)
            return step(borders, goal, 1, d0 + 1, carry)
        return pair

    def step(borders, goal, p, d, carry, sub_static=None):
        """One anti-diagonal.  ``borders``/``goal``/``p`` are STATIC phase
        flags: for d >= W+2 the band interior cannot touch row 0 / column 0
        (min i_lane = ceil((d-W)/2) >= 1, same for j_lane) and no lane is
        outside the matrix, so the three border masks are provably no-ops;
        in mode 0 the goal capture only ever fires at d == ql+tl, so steps
        before the tile's smallest real goal skip that bookkeeping too.
        Stripping both from the long middle phase removes ~14 of ~36
        vector ops per cell (the sweep is VPU-bound); the static parity
        strips another ~6."""
        score, bc, bi, bj, cc, ci, rc, rj, pacc = carry
        i0 = (d + W) // 2                                  # row at lane 0
        j0 = d - i0                                        # col at lane 0

        if p == 0:
            # --- stream query byte q[i0-1] into lane 0 (even steps) ---
            aq = jnp.clip(i0 - 1, 0, n_len - 1)
            offq = jax.lax.rem(aq, 128)
            baseq = pl.multiple_of(aq - offq, 128)

            @pl.when((offq == 0) | (d == 2))
            def _():
                qchunk_s[...] = q_ref[:, pl.ds(baseq, 128)]

            qd = qd_s[...]
            qnew = chunk_byte(qchunk_s, offq)
            qd = jnp.where(lanes == 0, qnew, pltpu.roll(qd, shift=1, axis=1))
            qd_s[...] = qd
            td = td_s[...]
        else:
            # --- stream target byte t[j0+W-2] into lane W-1 (odd steps) ---
            at = jnp.clip(j0 + W - 2, 0, m_len - 1)
            offt = jax.lax.rem(at, 128)
            baset = pl.multiple_of(at - offt, 128)

            @pl.when((offt == 0) | (d == 3))
            def _():
                tchunk_s[...] = t_ref[:, pl.ds(baset, 128)]

            qd = qd_s[...]
            td = td_s[...]
            tnew = chunk_byte(tchunk_s, offt)
            td = jnp.where(lanes == W - 1, tnew,
                           pltpu.roll(td, shift=W - 1, axis=1))
            td_s[...] = td

        h2 = h2_s[...]
        h1 = h1_s[...]
        # Up (i-1, j): lane l on even d, l+1 on odd.  Left (i, j-1): l-1 on
        # even d, l on odd.  Band-edge rolls wrap, so mask them to invalid.
        if p == 0:
            up = h1
            left = pltpu.roll(h1, shift=1, axis=1)
            left = jnp.where(lanes == 0, _NEG, left)
        else:
            up = pltpu.roll(h1, shift=W - 1, axis=1)
            up = jnp.where(lanes == W - 1, _NEG, up)
            left = h1

        sub = jnp.where(qd == td, match, mismatch)
        diag_v = h2 + sub
        if dash_free and not want_parents:
            # Static specialization: callers proved no input byte is '-'
            # (host-side scan at ingestion), so the reference's literal-dash
            # free-gap rule (team_alignment.cpp:25-28) is a no-op and its
            # 2 compares + 2 selects per cell drop out of the VPU-bound
            # sweep.  Score-only also shares the single gap scalar across
            # both indel branches: max(left, up) + gap saves one more add.
            h = jnp.maximum(diag_v, jnp.maximum(left, up) + gap)
        else:
            if dash_free:
                left_v = left + gap
                up_v = up + gap
            else:
                del_cost = jnp.where(qd == _DASH, 0, gap)
                ins_cost = jnp.where(td == _DASH, 0, gap)
                left_v = left + ins_cost
                up_v = up + del_cost
            if want_parents:
                # M > I > D first-set / strictly-greater priority
                # (team_alignment.cpp:104-114).
                h = diag_v
                parent = jnp.zeros_like(h)
                h = jnp.where(left_v > h, left_v, h)
                parent = jnp.where(left_v > diag_v, 1, parent)
                take_d = up_v > h
                h = jnp.where(take_d, up_v, h)
                parent = jnp.where(take_d, 2, parent)
            else:
                h = jnp.maximum(jnp.maximum(diag_v, left_v), up_v)

        i_lane = i0 - lanes
        j_lane = d - i_lane
        if mode == 1:
            h = jnp.maximum(h, 0)                          # local clamp
        if borders:
            h = jnp.where(i_lane == 0, j_lane * init, h)   # row 0
            h = jnp.where(j_lane == 0, i_lane * init, h)   # col 0
            h = jnp.where((i_lane < 0) | (j_lane < 0), _NEG, h)

        if want_parents:
            # Pack 4 consecutive steps' 2-bit parents into one byte in a
            # register accumulator before anything touches VMEM/HBM: the
            # parent stream is the -c path's dominant memory (a byte per
            # band cell was ~4 GB per 8 kb x 512 batch, OOMing next to the
            # resident index) and its DMA the dominant bandwidth.  Layout:
            # step idx = d-2 lands in byte row idx>>2 at bit 2*(idx&3)
            # (ops/trace.py walk_parents and utils/cigar._parent read it).
            idx = d - 2

            def store_pbuf():
                pbuf_s[jax.lax.rem(idx, CH) // 4] = pacc.astype(jnp.uint8)

            def flush_chunk():
                base = pl.multiple_of(idx - jax.lax.rem(idx, CH), CH)
                cp = pltpu.make_async_copy(
                    pbuf_s,
                    par_ref.at[pl.ds(base // 4, CH // 4),
                               pl.ds(tile * BT, BT), :],
                    dma_sem)
                cp.start()
                cp.wait()

            if sub_static is None:
                sub = jax.lax.rem(idx, 4)
                pp = parent << (2 * sub)
                pacc = jnp.where(sub == 0, pp, pacc | pp)

                @pl.when((sub == 3) | (d == d_stop))
                def _():
                    store_pbuf()

                # Flush a full chunk (or the final partial one) to HBM.
                @pl.when((jax.lax.rem(idx, CH) == CH - 1) | (d == d_stop))
                def _():
                    flush_chunk()
            else:
                # Quad loop (make_quad): the byte position is STATIC, so
                # the packing is a plain shift-or, the byte store runs
                # unconditionally once per 4 steps, and only the rare
                # final-partial-byte case stays behind a predicate.
                pp = parent << (2 * sub_static)
                pacc = pp if sub_static == 0 else (pacc | pp)
                if sub_static == 3:
                    store_pbuf()

                    @pl.when((jax.lax.rem(idx, CH) == CH - 1)
                             | (d == d_stop))
                    def _():
                        flush_chunk()
                else:
                    @pl.when(d == d_stop)
                    def _():
                        store_pbuf()
                        flush_chunk()

        if mode == 0 and goal:
            # Goal (ql, tl): captured on its anti-diagonal at its band lane.
            hit = d == (ql + tl)
            lstar = (tl - ql + W - p) // 2
            val = jnp.sum(jnp.where(lanes == lstar, h, 0), axis=1,
                          keepdims=True)
            score = jnp.where(hit, val, score)
        elif mode == 1:
            # Local argmax over in-region band cells, first strictly-greater
            # in row-major order (team_alignment.cpp:185-192): on one
            # anti-diagonal the smallest i sits at the LARGEST lane
            # (i = i0 - l); across diagonals equal (cost, i) keeps the
            # earlier d (smaller j).
            valid = ((i_lane >= 1) & (i_lane <= ql)
                     & (j_lane >= 1) & (j_lane <= tl))
            cand = jnp.where(valid, h, _NEG)
            c = jnp.max(cand, axis=1, keepdims=True)
            lmax = jnp.max(jnp.where(cand == c, lanes, -1), axis=1,
                           keepdims=True)
            i_cand = i0 - lmax
            take = (c > _NEG) & ((c > bc) | ((c == bc) & (i_cand < bi)))
            bc = jnp.where(take, c, bc)
            bi = jnp.where(take, i_cand, bi)
            bj = jnp.where(take, d - i_cand, bj)
        else:
            # semiGlobal rim argmax (team_alignment.cpp:265-278): last
            # column scanned i-ascending (== d-ascending here), then last
            # row j-ascending; strictly-greater keeps the earliest.
            i_col = d - tl
            l_col = i0 - i_col
            ok_col = ((i_col >= 0) & (i_col <= ql)
                      & (l_col >= 0) & (l_col < W))
            v_col = jnp.sum(jnp.where(lanes == l_col, h, 0), axis=1,
                            keepdims=True)
            take = ok_col & (v_col > cc)
            cc = jnp.where(take, v_col, cc)
            ci = jnp.where(take, i_col, ci)
            j_row = d - ql
            l_row = i0 - ql
            ok_row = ((j_row >= 0) & (j_row <= tl)
                      & (l_row >= 0) & (l_row < W))
            v_row = jnp.sum(jnp.where(lanes == l_row, h, 0), axis=1,
                            keepdims=True)
            take = ok_row & (v_row > rc)
            rc = jnp.where(take, v_row, rc)
            rj = jnp.where(take, j_row, rj)

        h2_s[...] = h1
        h1_s[...] = h
        return score, bc, bi, bj, cc, ci, rc, rj, pacc

    zero = jnp.zeros((BT, 1), jnp.int32)
    neg = jnp.full((BT, 1), _NEG, jnp.int32)
    pacc0 = jnp.zeros((BT, W) if want_parents else (BT, 1), jnp.int32)
    carry0 = (zero, neg, zero, zero, zero, zero, zero, zero, pacc0)
    # Every goal rule only reads cells with d <= ql + tl, so the sweep stops
    # at the tile's largest one (dynamic bound).  Phases (see step):
    # [2, W+2) with borders; then border-free, and for mode 0 the goal
    # capture only runs from the tile's smallest real goal diagonal on.
    # All phase boundaries are rounded to EVEN diagonals for the 2-step
    # pair loop: the border end rounds UP (border masks are no-ops one step
    # late), the goal start rounds DOWN (capture is exact-guarded), and the
    # sweep end rounds UP (the extra trailing diagonal only touches
    # scratch; captures stay guarded by their exact per-read conditions).
    d_stop = jnp.minimum(jnp.max(ql + tl), n_steps + 1)
    if want_parents:
        # Quad loop: 4 diagonals per iteration so the parent-byte position
        # (d - 2) & 3 is STATIC per sub-step (see step's sub_static arm).
        # Quad h covers d in [4h+2, 4h+5]; boundary rounding as for pairs
        # (borders round UP - late masks are no-ops; goal start rounds
        # DOWN - capture is exact-guarded; end rounds UP - the trailing
        # diagonals only touch scratch and post-d_stop parent bytes, which
        # the walk never reads).
        def make_quad(borders, goal):
            def quad(h, carry):
                d0 = 4 * h + 2
                carry = step(borders, goal, 0, d0, carry, 0)
                carry = step(borders, goal, 1, d0 + 1, carry, 1)
                carry = step(borders, goal, 0, d0 + 2, carry, 2)
                return step(borders, goal, 1, d0 + 3, carry, 3)
            return quad

        h_end = (d_stop - 2) // 4 + 1
        h_border = jnp.minimum(jnp.int32(W // 4 + 1), h_end)
        carry = jax.lax.fori_loop(0, h_border, make_quad(True, True),
                                  carry0)
        if mode == 0:
            d_goal = jnp.min(jnp.where(ql > 0, ql + tl, jnp.int32(2**30)))
            h_goal = jnp.clip((d_goal - 2) // 4, h_border, h_end)
            carry = jax.lax.fori_loop(h_border, h_goal,
                                      make_quad(False, False), carry)
            carry = jax.lax.fori_loop(h_goal, h_end,
                                      make_quad(False, True), carry)
        else:
            carry = jax.lax.fori_loop(h_border, h_end,
                                      make_quad(False, True), carry)
    else:
        e_end = (d_stop + 2) // 2              # pairs cover d <= d_stop
        e_border = jnp.minimum(jnp.int32((W + 2) // 2), e_end)
        carry = jax.lax.fori_loop(1, e_border, make_pair(True, True),
                                  carry0)
        if mode == 0:
            d_goal = jnp.min(jnp.where(ql > 0, ql + tl, jnp.int32(2**30)))
            e_goal = jnp.clip(d_goal // 2, e_border, e_end)
            carry = jax.lax.fori_loop(e_border, e_goal,
                                      make_pair(False, False), carry)
            carry = jax.lax.fori_loop(e_goal, e_end,
                                      make_pair(False, True), carry)
        else:
            carry = jax.lax.fori_loop(e_border, e_end,
                                      make_pair(False, True), carry)
    score, bc, bi, bj, cc, ci, rc, rj, _ = carry
    if mode == 0:
        score_ref[...] = score
        gi_ref[...] = ql
        gj_ref[...] = tl
    elif mode == 1:
        hit = bc > _NEG
        score_ref[...] = jnp.where(hit, bc, 0)
        gi_ref[...] = jnp.where(hit, bi, 0)
        gj_ref[...] = jnp.where(hit, bj, 0)
    else:
        row_wins = rc > cc
        score_ref[...] = jnp.where(row_wins, rc, cc)
        gi_ref[...] = jnp.where(row_wins, ql, ci)
        gj_ref[...] = jnp.where(row_wins, rj, tl)


@functools.partial(jax.jit, static_argnames=("band", "block", "interpret",
                                              "want_parents", "mode",
                                              "dash_free"))
def align_scores_banded(q_bytes: jax.Array, q_lens: jax.Array,
                        t_bytes: jax.Array, t_lens: jax.Array,
                        match: jax.Array, mismatch: jax.Array,
                        gap: jax.Array, band: int = 256, block: int = 0,
                        interpret: bool = False,
                        want_parents: bool = False,
                        mode: int = 0, dash_free: bool = False) -> AlignOut:
    """Banded scores for all three modes; exact iff `certify(..., mode=)`
    (else a lower bound of the in-band optimum).  Drop-in AlignOut like
    align_scores; local/semiGlobal goal cells come from in-band argmax /
    rim tracking with the reference's scan-order tie rules
    (team_alignment.cpp:185-192, 265-278).

    With ``want_parents``, parents are emitted in band coordinates packed
    4-STEPS-per-uint8: (steps/4, B, W) with step idx = d-2 at row idx>>2,
    lane l = (j-i+W-(d&1))/2, bit offset 2*(idx&3).  The kernel packs in a
    register accumulator and DMAs 32-row chunks, so the parent stream costs
    one QUARTER byte per band cell end to end (HBM, VMEM and DMA) - walk
    with utils.cigar.traceback band=W or ops.trace.walk_parents (both
    dispatch on the uint8 dtype; the lax align_banded_parents keeps the
    16-lanes-per-uint32 layout).  Only reads passing
    certify(..., strict=True) may trust them.
    """
    B, n = q_bytes.shape
    m = t_bytes.shape[1]
    W = _round_up(band, 128)
    # block=0: widest tile the batch fills - grid tiles run sequentially, so
    # fewer/wider tiles cut the serial step count (measured 45 -> 33 ms per
    # 256x4k batch going 32 -> 128) while staying well inside VMEM.  For
    # 3/4-point batch caps (192, 384, ... - pipeline/mapper._batch_cap) a
    # 128 tile would round the batch back up to the pow-2; 64 divides them.
    BT = block if block else (
        128 if B >= 128 and B % 128 == 0 else
        64 if B >= 64 else 32)
    # VMEM guard for very wide bands (outlier-read reruns can reach
    # whole-matrix width): 4 int32 state rows + the packed parent chunk
    # cost ~48 B per lane per tile row.
    while BT > 8 and BT * W * 48 > 12e6:
        BT //= 2
    # Parents feed the Pallas walk, whose slab/output DMAs require the
    # batch dim 128-aligned; score-only batches may land on 64-grained
    # 3/4-point caps (192, 384 - pipeline/mapper._batch_cap).
    b_pad = _round_up(max(B, BT), 128 if want_parents else BT)
    n_pad = _round_up(max(n, 128), 128)
    # The band never touches j > i + W, so the target tail beyond n+W is
    # dead weight; reads needing it fail certification anyway.
    m_eff = _round_up(max(min(m, n + W), 128), 128)

    q_p = jnp.zeros((b_pad, n_pad), dtype=jnp.uint8)
    q_p = q_p.at[:B, :n].set(q_bytes)
    t_p = jnp.zeros((b_pad, m_eff), dtype=jnp.uint8)
    t_p = t_p.at[:B, :min(m, m_eff)].set(t_bytes[:, :m_eff])
    ql = jnp.zeros((b_pad, 1), jnp.int32).at[:B, 0].set(
        q_lens.astype(jnp.int32))
    tl = jnp.zeros((b_pad, 1), jnp.int32).at[:B, 0].set(
        jnp.minimum(t_lens.astype(jnp.int32), m_eff))
    prm = jnp.array([[match, mismatch, gap]], dtype=jnp.int32)

    half = W // 2
    # Band-state seeds for d=1: lane l holds q[i(l)-1] with i(l) = W/2 - l
    # (reversed query prefix) and t[j(l)-1] with j(l) = l - W/2 + 1.
    qd0 = jnp.zeros((b_pad, W), dtype=jnp.uint8)
    qd0 = qd0.at[:, :half].set(
        jnp.flip(q_p[:, :half], axis=1))
    td0 = jnp.zeros((b_pad, W), dtype=jnp.uint8)
    td0 = td0.at[:, half:].set(t_p[:, :half])

    n_steps = (n_pad - 1) + (m_eff + 1) - 1   # d = 2 .. n_pad + m_eff
    CH = 128                                  # parent-flush chunk (steps)
    steps_pad = _round_up(n_steps, CH)
    kernel = functools.partial(_kernel, W, BT, n_pad, m_eff, n_steps,
                               want_parents, CH, mode, dash_free)
    grid = (b_pad // BT,)
    row_spec = pl.BlockSpec((BT, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((BT, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [row_spec, row_spec, row_spec]
    out_shape = [jax.ShapeDtypeStruct((b_pad, 1), jnp.int32)] * 3
    scratch = [
        pltpu.VMEM((BT, W), jnp.int32),
        pltpu.VMEM((BT, W), jnp.int32),
        pltpu.VMEM((BT, W), jnp.int32),
        pltpu.VMEM((BT, W), jnp.int32),
        pltpu.VMEM((BT, 128), jnp.uint8),
        pltpu.VMEM((BT, 128), jnp.uint8),
    ]
    if want_parents:
        # Whole-array HBM output, already 4-steps-per-byte packed by the
        # kernel; the kernel DMAs CH-step (= CH/4-row) chunks into it.
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((steps_pad // 4, b_pad, W), jnp.uint8))
        scratch += [pltpu.VMEM((CH // 4, BT, W), jnp.uint8),
                    pltpu.SemaphoreType.DMA]
    else:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((1, 1, 1), jnp.uint8))
        scratch += [pltpu.VMEM((1, 1, 1), jnp.uint8),
                    pltpu.SemaphoreType.DMA]

    score, gi, gj, par8 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            pl.BlockSpec((BT, m_eff), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            band_spec,
            band_spec,
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(q_p, ql, t_p, tl, qd0, td0, prm)

    if want_parents:
        # Already packed by the kernel (4 steps per byte): (S/4, B, W)
        # uint8, step idx at row idx>>2 bit 2*(idx&3).  The uint8 dtype is
        # the layout marker ops/trace.walk_parents and utils/cigar._parent
        # dispatch on (uint32 = 16-lanes-per-word, the lax fallback's).
        parents = par8[:, :B, :]
    else:
        parents = jnp.zeros((0, 0, 0), dtype=jnp.uint32)

    if mode == 0:
        gi_out = q_lens.astype(jnp.int32)
        gj_out = jnp.minimum(t_lens.astype(jnp.int32), m_eff)
    else:
        gi_out = gi[:B, 0]
        gj_out = gj[:B, 0]
    return AlignOut(score=score[:B, 0], goal_i=gi_out, goal_j=gj_out,
                    parents=parents)


def certify(score: jax.Array, q_bytes: jax.Array, q_lens: jax.Array,
            t_bytes: jax.Array, t_lens: jax.Array,
            match: jax.Array, mismatch: jax.Array, gap: jax.Array,
            band: int, strict: bool = False,
            lane_multiple: int = 128, mode: int = 0) -> jax.Array:
    """(B,) bool: the banded score provably equals the full DP's.

    ``strict`` additionally guarantees the TRACEBACK is byte-identical: with
    score strictly beating the bound no out-of-band path can even tie, so
    the canonical M>I>D path of the full DP lies entirely in-band, every
    cell on it keeps its full-DP value (the in-band path prefix realizes
    it), and band-masked competitors (whose values only shrink) cannot flip
    any first-set strictly-greater parent choice.  Use it when consuming
    banded parents; the score-only fused path does not need it (a tying
    path yields the same score).

    Mode-specific bounds (gap <= 0 required; W = rounded band):
      * global (0): an out-of-band path pays >= 2*(W-1) - |m-n| gaps, so it
        scores at most maxsub*min(n,m) + gap*(2*(W-1) - |m-n|).
      * local (1) / semiGlobal (2): paths may start/end anywhere, so the
        gap argument fails, but any path TOUCHING offset >= W-1 (or
        <= -(W-1)) fits at most min(n, m-W+1) (resp. min(m, n-W+1))
        diagonal steps, each worth at most maxsub; free '-' gaps add
        nothing under gap <= 0.  Bound = maxsub * that count.  For
        local/semiGlobal the argmax / rim-scan tie order is also preserved:
        any cell tying the banded best must have an in-band optimal path
        (an out-of-band one is capped by the bound), hence its banded value
        is exact, and the kernel replicates the reference's scan order
        among in-band cells.

    ``lane_multiple`` must match the kernel's band rounding: 128 for the
    Pallas kernel, 16 for the lax align_banded_parents.
    """
    W = _round_up(band, lane_multiple)
    ql = q_lens.astype(jnp.int32)
    tl = t_lens.astype(jnp.int32)
    diff = tl - ql
    # Band covers the whole matrix: every offset o in [-n, m] is in
    # [-W, W-2] -> banded IS the full DP (no score test needed).
    whole = (ql <= W) & (tl <= W - 2)
    maxsub = jnp.maximum(jnp.maximum(match, mismatch), 0).astype(jnp.int32)
    if mode == 0:
        goal_in_band = (diff >= -W) & (diff <= W - 2)
        gaps_min = 2 * (W - 1) - jnp.abs(diff)
        bound = (maxsub * jnp.minimum(ql, tl)
                 + gap.astype(jnp.int32) * gaps_min)
        no_dash = ~(jnp.any(q_bytes == _DASH, axis=1)
                    | jnp.any(t_bytes == _DASH, axis=1))
        beats = (score > bound) if strict else (score >= bound)
        strong = (gap < 0) & no_dash & beats
        return goal_in_band & (whole | strong)
    bound = maxsub * jnp.clip(
        jnp.maximum(jnp.minimum(ql, tl - (W - 1)),
                    jnp.minimum(tl, ql - (W - 1))), 0, None)
    beats = (score > bound) if strict else (score >= bound)
    strong = (gap <= 0) & beats
    return whole | strong
