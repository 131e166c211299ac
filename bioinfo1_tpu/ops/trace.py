"""On-device traceback walk over packed parent diagonals.

The wavefront kernels leave 2-bit parents on the device ((S, B, PW) uint32,
16 lanes/word).  Fetching that tensor to walk it on the host costs two ways:
the device->host transfer (the -c bottleneck: 17-269 MB per batch) and a
serial Python walk (~10^4 loop iterations per read).  This walk runs as ONE
lax.scan over the whole batch instead: each step gathers one parent word per
read and advances every read's (i, j) cursor in lockstep; the fetched result
is a (steps, B) uint8 op-code tensor (~300 KB) that the host merely
run-length encodes (vectorized numpy, utils/cigar.cigar_from_codes).

Walk semantics mirror utils/cigar.traceback exactly (which mirrors the
reference, team_alignment.cpp:122-161/201-238/286-335):
  * global/semiGlobal: walk to (0,0); boundary rules i==0 -> I, j==0 -> D,
  * local: maintain the running cost and stop at 0 (literal '-' edges cost
    0, team_alignment.cpp:25-28),
  * op codes: 0=M, 1=I, 2=D, 255=done.

Supports both parent layouts: full (lane = i) and banded (lane =
(j - i + band - (d & 1)) / 2, see ops/pallas_band.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

OP_M, OP_I, OP_D, OP_DONE = 0, 1, 2, 255


@functools.partial(jax.jit, static_argnames=("mode", "band"))
def walk_parents(parents: jax.Array, goal_i: jax.Array, goal_j: jax.Array,
                 score: jax.Array, q_bytes: jax.Array, t_bytes: jax.Array,
                 match: jax.Array, mismatch: jax.Array, gap: jax.Array,
                 mode: int, band: int = 0) -> jax.Array:
    """(steps, B) uint8 op codes, goal -> origin order.

    Args:
      parents: packed parents, either (S, B, PW) uint32 (16 lanes per word,
        diag d at row d-2 - the lax kernels' layout) or (S4, B, W) uint8
        (4 STEPS per byte, step idx = d-2 at row idx>>2 bit 2*(idx&3) - the
        Pallas banded kernel's in-kernel-packed layout; banded only).
      goal_i/goal_j: (B,) traceback start cells.
      score: (B,) DP scores (local mode's stop counter; ignored otherwise).
      q_bytes/t_bytes: (B, n)/(B, m) region bytes (local edge costs).
      mode: 0 global / 1 local / 2 semiGlobal (static).
      band: 0 for full-layout parents, else the band width W (static).
    """
    S, B, PW = parents.shape
    step_packed = parents.dtype == jnp.uint8
    rows = jnp.arange(B, dtype=jnp.int32)
    match = jnp.int32(match)
    mismatch = jnp.int32(mismatch)
    gap = jnp.int32(gap)
    dash = jnp.int32(ord("-"))
    qn = q_bytes.shape[1]
    tm = t_bytes.shape[1]

    # One element per read per step, gathered by 3-D coordinate: a linear
    # index into the flattened tensor would overflow int32 (the uint8
    # layout reaches 2.3e9 ELEMENTS at 512 x 8 kb x band 1024 - past
    # 2^31 - which raised mid-walk and killed every big -c batch).
    gdn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0, 1, 2),
        start_index_map=(0, 1, 2))

    def gather3(r, lane_w):
        starts = jnp.stack([r, rows, lane_w], axis=1)        # (B, 3)
        return jax.lax.gather(parents, starts, gdn,
                              slice_sizes=(1, 1, 1), mode="clip")

    def parent_at(i, j):
        d = i + j
        if band:
            lane = (j - i + band - (d & 1)) >> 1
        else:
            lane = i
        if step_packed:
            word = gather3(jnp.clip(d - 2, 0, 4 * S - 1) >> 2,
                           lane).astype(jnp.int32)
            return (word >> (2 * ((d - 2) & 3))) & 3
        word = gather3(jnp.clip(d - 2, 0, S - 1), lane >> 4)
        return ((word >> (2 * (lane & 15).astype(jnp.uint32)))
                & 3).astype(jnp.int32)

    def byte_at(arr, pos, width):
        idx = rows * width + jnp.clip(pos, 0, width - 1)
        return jnp.take(arr.reshape(-1), idx).astype(jnp.int32)

    def step_once(carry):
        i, j, cost = carry
        p_in = parent_at(i, j)
        if mode == 1:  # local: stop at cost 0
            active = cost > 0
            p = p_in
            qc = byte_at(q_bytes, i - 1, qn)
            tc = byte_at(t_bytes, j - 1, tm)
            edge = jnp.where(
                p == OP_M, jnp.where(qc == tc, match, mismatch),
                jnp.where(p == OP_I,
                          jnp.where(tc == dash, 0, gap),
                          jnp.where(qc == dash, 0, gap)))
            cost = jnp.where(active, cost - edge, cost)
        else:
            active = (i > 0) | (j > 0)
            p = jnp.where(i == 0, OP_I, jnp.where(j == 0, OP_D, p_in))
        code = jnp.where(active, p, OP_DONE).astype(jnp.uint8)
        di = jnp.where((p == OP_M) | (p == OP_D), 1, 0)
        dj = jnp.where((p == OP_M) | (p == OP_I), 1, 0)
        i = jnp.where(active, i - di, i)
        j = jnp.where(active, j - dj, j)
        return (i, j, cost), code

    # 4 walk steps per loop iteration: the walk is a serial chain of tiny
    # gathers, and on TPU the per-iteration loop overhead rivals the gather
    # itself; unrolling quarters the iteration count (trailing over-steps
    # past the origin emit OP_DONE and are ignored by the RLE).  The loop
    # EXITS once every read is done (lax.while_loop + in-place buffer
    # updates): real paths end at goal_i+goal_j steps, ~20% short of the
    # padded step count, and mixed buckets' short reads finish earlier
    # still.  The buffer is pre-filled with OP_DONE so skipped iterations
    # read as finished.
    UNROLL = 4
    def step(carry):
        codes = []
        for _k in range(UNROLL):
            carry, c = step_once(carry)
            codes.append(c)
        return carry, jnp.stack(codes)

    carry0 = (goal_i.astype(jnp.int32), goal_j.astype(jnp.int32),
              score.astype(jnp.int32))
    total_steps = 4 * S if step_packed else S
    n_iter = -(-(total_steps + 2) // UNROLL)
    buf0 = jnp.full((n_iter, UNROLL, B), OP_DONE, jnp.uint8)

    def any_active(c):
        i, j, cost = c
        if mode == 1:
            return jnp.any(cost > 0)
        return jnp.any((i > 0) | (j > 0))

    def cond(state):
        carry, it, _ = state
        return (it < n_iter) & any_active(carry)

    def body(state):
        carry, it, buf = state
        carry, codes = step(carry)
        buf = jax.lax.dynamic_update_slice(buf, codes[None], (it, 0, 0))
        return carry, it + 1, buf

    _, _, codes = jax.lax.while_loop(cond, body, (carry0, jnp.int32(0), buf0))
    return codes.reshape(n_iter * UNROLL, -1)


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def walk_parents_pallas(parents: jax.Array, goal_i: jax.Array,
                        goal_j: jax.Array, band: int,
                        interpret: bool = False) -> jax.Array:
    """Pallas traceback walk over the band kernel's 4-step-packed parents.

    Returns (D4, B) uint8 codes ALREADY packed 4-per-byte (pack_codes
    layout), indexed by ANTI-DIAGONAL: entry t (= row t>>2, bit 2*(t&3))
    holds diagonal d = D_hi - t, descending.  A read emits its op when the
    sweep reaches its current diagonal and 3 (skip) otherwise - before its
    goal diagonal, after reaching the origin, and on the diagonal a match
    step jumps over.  Decoders skip code 3 (utils/cigar.cigar_from_codes,
    native/cigar.cpp), so the non-3 subsequence is exactly the goal->origin
    walk the XLA path produces.

    Why: the XLA walk is a serial chain of one-byte HBM gathers
    (~8.5 us/round at B=512 - gather LATENCY, DESIGN.md section 20).  Here
    the parent rows stream through VMEM in descending double-buffered DMA
    slabs (dense reads at HBM bandwidth) and the per-diagonal extraction is
    a (B, W) masked reduce on the VPU - 48 -> ~16 ms per 512 x 8 kb batch.
    Global/semiGlobal only (the local walk needs per-step byte costs, which
    would add a (B, n)-wide reduce per diagonal; mode 1 keeps the XLA walk).

    Args:
      parents: (S4, B, W) uint8, the Pallas band kernel's packed layout
        (step idx = d-2 at row idx>>2, bit 2*(idx&3), lane
        (j-i+W-(d&1))/2).
      goal_i/goal_j: (B,) walk start cells (mode-0 goals are (ql, tl);
        semiGlobal goals come from the rim argmax).
      band: static band width W (multiple of 128).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S4, B, W = parents.shape
    assert W == band
    R = 8                                   # parent rows per DMA slab
    S4p = -(-S4 // R) * R
    D_hi = 4 * S4 + 1                       # largest representable diagonal
    D4 = -(-(D_hi) // 4)
    CH4 = 32                                # packed out rows per DMA flush
    D4p = -(-D4 // CH4) * CH4
    # The slab and output DMAs need 128-aligned batch dims; the band
    # kernel already pads want_parents batches to 128-multiples, so this
    # never copies the multi-GB parent tensor.
    b_pad = -(-B // 128) * 128

    gi = jnp.zeros((1, b_pad), jnp.int32).at[0, :B].set(
        goal_i.astype(jnp.int32))
    gj = jnp.zeros((1, b_pad), jnp.int32).at[0, :B].set(
        goal_j.astype(jnp.int32))

    def kernel(par_ref, gi_ref, gj_ref, out_ref, slab_s, obuf_s, in_sem,
               out_sem):
        NC = W // 128
        lanes2 = jax.lax.broadcasted_iota(jnp.int32, (b_pad, 2 * 128), 1)
        chunks = jax.lax.broadcasted_iota(jnp.int32, (b_pad, NC, 128), 1)

        def slab_dma(s, buf):
            return pltpu.make_async_copy(
                par_ref.at[pl.ds(pl.multiple_of(s * R, R), R)],
                slab_s.at[buf], in_sem.at[buf])

        s_top = (S4 - 1) // R
        slab_dma(s_top, s_top % 2).start()

        i0 = jnp.swapaxes(gi_ref[...], 0, 1)          # (b_pad, 1)
        j0 = jnp.swapaxes(gj_ref[...], 0, 1)
        rows_ch = jax.lax.broadcasted_iota(jnp.int32, (CH4, b_pad), 0)

        # One iteration per PACKED PARENT ROW (4 consecutive diagonals,
        # descending).  D_hi = 4*S4 + 1 makes group g's top diagonal
        # d_top = D_hi - 4g satisfy (d_top - 2) & 3 == 3, so the whole
        # group reads ONE parent row and ONE output byte completes per
        # iteration - the window refresh, the byte store and the DMA
        # flush all run unconditionally at static positions instead of
        # behind per-step lax.cond/@pl.when tests (the former per-DIAGONAL
        # loop spent ~60% of its time in that branch machinery: 74 ->
        # ~28 ms per 512 x 8 kb batch at W=1152).
        n_groups = pl.cdiv(D_hi, 4)

        def group(g, carry):
            i, j, obuf, cur_slab = carry
            d_top = D_hi - 4 * g
            rp = jnp.clip((d_top - 2) >> 2, 0, S4 - 1)
            s = rp // R

            @pl.when(s < cur_slab)
            def _():
                slab_dma(s, s % 2).wait()

                @pl.when(s >= 1)
                def _():
                    slab_dma(s - 1, (s - 1) % 2).start()

            cur_slab = jnp.minimum(cur_slab, s)
            # Per-read 256-lane window of the group's parent row: the
            # cursor drifts <= 1 lane per step, so anchoring 4 lanes below
            # the group-entry lane covers all 4 steps; the per-diagonal
            # byte select then runs on (B, 256) instead of (B, W).
            lane_in = (j - i + W - (d_top & 1)) >> 1
            prow = slab_s[s % 2, rp % R]              # (b_pad, W) uint8
            c = jnp.clip((lane_in - 4) >> 7, 0, max(NC - 2, 0))
            # Chunk-pair select as a STATIC uint8 select-chain (no 3-D
            # masked reduction - 8-bit reductions are not lowerable, and
            # the int32 version paid a full-row widening per group): NC
            # selects on (B, 128) byte tiles, then only the 256 chosen
            # lanes widen to int32.
            hi_c = jnp.minimum(c + 1, NC - 1)
            lo = prow[:, 0:128]
            hi = lo
            for nc in range(1, NC):
                tile = prow[:, nc * 128:(nc + 1) * 128]
                lo = jnp.where(c == nc, tile, lo)
                hi = jnp.where(hi_c == nc, tile, hi)
            cache = jnp.concatenate([lo, hi], axis=1).astype(jnp.int32)
            cbase = c << 7

            acc = jnp.int32(0xFF)
            for sub in range(4):                      # static unroll
                d = d_top - sub
                lane = (j - i + W - (d & 1)) >> 1
                word = jnp.sum(
                    jnp.where(lanes2 == lane - cbase, cache, 0),
                    axis=1, keepdims=True)
                p = (word >> (2 * ((d - 2) & 3))) & 3
                p = jnp.where(i == 0, OP_I, jnp.where(j == 0, OP_D, p))
                alive = (i > 0) | (j > 0)
                # Trailing sub-steps past d = 2 decode garbage rows but
                # i + j == d can no longer hold there (d <= 1 needs a
                # finished read), so they emit 3 like any off-diagonal.
                at_d = alive & (i + j == d)
                code = jnp.where(at_d, p, 3)
                di = jnp.where((p == OP_M) | (p == OP_D), 1, 0)
                dj = jnp.where((p == OP_M) | (p == OP_I), 1, 0)
                i = jnp.where(at_d, i - di, i)
                j = jnp.where(at_d, j - dj, j)
                code_row = jnp.swapaxes(code, 0, 1).astype(jnp.int32)
                acc = (acc & ~(3 << (2 * sub))) | (code_row << (2 * sub))

            obuf = jnp.where(rows_ch == jax.lax.rem(g, CH4), acc, obuf)

            @pl.when((jax.lax.rem(g, CH4) == CH4 - 1) | (g == n_groups - 1))
            def _():
                base = pl.multiple_of(g - jax.lax.rem(g, CH4), CH4)
                obuf_s[...] = obuf.astype(jnp.uint8)
                cp = pltpu.make_async_copy(
                    obuf_s, out_ref.at[pl.ds(base, CH4)], out_sem)
                cp.start()
                cp.wait()

            return i, j, obuf, cur_slab

        # (Measured negative result: a two-rows-per-iteration unroll
        # changed nothing - 20.7 vs 21 ms - the cost is the per-group
        # vector work, not loop overhead.)
        jax.lax.fori_loop(
            0, n_groups, group,
            (i0, j0, jnp.zeros((CH4, b_pad), jnp.int32),
             jnp.int32(s_top + 1)))

    par_p = parents
    if S4p != S4 or b_pad != B:
        par_p = jnp.zeros((S4p, b_pad, W), jnp.uint8).at[:S4, :B].set(
            parents)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((D4p, b_pad), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, R, b_pad, W), jnp.uint8),
            pltpu.VMEM((CH4, b_pad), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(par_p, gi, gj)
    return out[:D4, :B]


@jax.jit
def pack_codes(codes: jax.Array) -> jax.Array:
    """Pack (S, B) op codes 4-per-byte for the device->host fetch.

    Codes are 2 bits of information ({M, I, D, done}); shipping them as one
    byte each made the fetch the fused -c path's largest cost on the remote
    TPU link (~2 MB -> ~50 ms per 256x4k batch).  done (255) maps to 3;
    rows are padded with done.  Inverse: unpack_codes_np.
    """
    S, B = codes.shape
    s_pad = -(-S // 4) * 4
    c = jnp.minimum(codes.astype(jnp.uint32), 3)
    c = jnp.concatenate(
        [c, jnp.full((s_pad - S, B), 3, jnp.uint32)], axis=0)
    c = c.reshape(s_pad // 4, 4, B)
    shifts = (2 * jnp.arange(4, dtype=jnp.uint32))[None, :, None]
    return jnp.sum(c << shifts, axis=1).astype(jnp.uint8)


def unpack_codes_np(packed) -> "np.ndarray":
    """Host inverse of pack_codes: (S4, B) uint8 -> (4*S4, B) op codes
    (vectorized numpy; 3 maps back to done=255).  Trailing done padding is
    harmless - the RLE stops at the first done code."""
    import numpy as np
    p = np.asarray(packed)
    s4, B = p.shape
    out = np.empty((s4, 4, B), np.uint8)
    for k in range(4):
        out[:, k, :] = (p >> (2 * k)) & 3
    out = out.reshape(4 * s4, B)
    return np.where(out == 3, np.uint8(OP_DONE), out)
