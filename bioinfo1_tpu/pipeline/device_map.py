"""Fully fused on-device map step: reads in, mapping coordinates + scores out.

This is the performance path and the unit of distribution.  One jit traces
the whole per-batch pipeline - minimizer sweep, fwd/rev index lookup, LIS
chaining, strand selection, region extraction by in-HBM gather, and the
anti-diagonal wavefront alignment - with no host round-trips between stages
(the host pipeline in pipeline/mapper.py stages through the host for the
CIGAR/bug-compat paths; this one is score-only, which is exactly what PAF
emission needs when -c is off).

Multi-chip: `shard_map` over the batch axis with the index replicated - see
bioinfo1_tpu/parallel/shard.py.  The reference's analog is the OpenMP
parallel-for over reads (team_mapper.cpp:596) with its shared in-RAM index.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from bioinfo1_tpu.ops import align as al
from bioinfo1_tpu.ops import chain as chain_ops
from bioinfo1_tpu.ops import match as match_ops
from bioinfo1_tpu.ops import minimizer as mz


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceIndex:
    """Device-resident replicated reference index.

    hash/pos arrays are the per-strand sorted indexes; ref_bytes stacks the
    forward and reverse-complement strand sequences as (2, ref_pad) uint8 so
    strand selection is a row index.
    """

    fwd_hash: jax.Array
    fwd_pos: jax.Array
    rev_hash: jax.Array
    rev_pos: jax.Array
    ref_bytes: jax.Array      # (2, ref_pad) uint8
    ref_len: jax.Array        # () int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapOut:
    """Per-read mapping summary (all (B,) int32 unless noted).

    mapped: bool; is_fwd: bool; q_begin/q_end/t_begin/t_end: 0-based
    inclusive region bounds (strand coordinates); score: DP score;
    overflow: match budget exceeded (host must retry bigger).
    """

    mapped: jax.Array
    is_fwd: jax.Array
    q_begin: jax.Array
    q_end: jax.Array
    t_begin: jax.Array
    t_end: jax.Array
    score: jax.Array
    overflow: jax.Array


def device_index_from_host(index, pad_to_pow2: bool = True) -> DeviceIndex:
    """Pack an index.builder.IndexArrays into device arrays."""
    import numpy as np

    def pad1(a, fill):
        n = len(a)
        cap = 8
        while cap < n:
            cap *= 2
        out = np.full((cap,), fill, dtype=a.dtype)
        out[:n] = a
        return out

    fh = index.fwd.hash_sorted.astype(np.uint32)
    rh = index.rev.hash_sorted.astype(np.uint32)
    fp = index.fwd.pos_sorted.astype(np.int32)
    rp = index.rev.pos_sorted.astype(np.int32)
    if pad_to_pow2:
        # Pad hashes with the max sentinel so searchsorted never lands in the
        # padding (real hash 0xFFFFFFFF entries would sort before pads of the
        # same value; positions pad with 0 and are unreachable).
        fh, rh = pad1(fh, 0xFFFFFFFF), pad1(rh, 0xFFFFFFFF)
        fp, rp = pad1(fp, 0), pad1(rp, 0)
    L = int(index.ref_len)
    cap = 16
    while cap < L:
        cap *= 2
    ref = np.zeros((2, cap), dtype=np.uint8)
    ref[0, :L] = np.frombuffer(index.ref_fwd_seq.encode("latin1"),
                               dtype=np.uint8)
    ref[1, :L] = np.frombuffer(index.ref_rev_seq.encode("latin1"),
                               dtype=np.uint8)
    return DeviceIndex(
        fwd_hash=jnp.asarray(fh), fwd_pos=jnp.asarray(fp),
        rev_hash=jnp.asarray(rh), rev_pos=jnp.asarray(rp),
        ref_bytes=jnp.asarray(ref), ref_len=jnp.int32(L))


def _extract_windows(src: jax.Array, begin: jax.Array, cap: int) -> jax.Array:
    """Gather (B, cap) windows src[b, begin[b] : begin[b]+cap] with clamp."""
    B = begin.shape[0]
    idx = begin[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, src.shape[-1] - 1)
    return jnp.take_along_axis(src, idx, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "mode", "budget", "region_cap",
                                    "use_pallas", "oob_end_windows"))
def map_step(reads: jax.Array, lens: jax.Array, index: DeviceIndex,
             match: jax.Array, mismatch: jax.Array, gap: jax.Array,
             *, k: int, w: int, mode: int,
             budget: int = 512, region_cap: int = 0,
             use_pallas: bool = False,
             oob_end_windows: bool = False) -> MapOut:
    """Map a read batch end-to-end on device (score-only).

    Args:
      reads: (B, L) uint8 right-padded read bytes.
      lens:  (B,) int32.
      index: replicated DeviceIndex.
      k, w, mode: static mapper parameters.
      match/mismatch/gap: int32 scoring scalars (traced).
      budget: static per-read match budget (overflow flagged for host retry).
      region_cap: static max alignment-region length; 0 means L + 8 rounded
        up - regions beyond it are clamped (flagged via overflow as well).
    """
    B, L = reads.shape
    if region_cap == 0:
        region_cap = L
    mres = mz.minimize_batch(reads, lens, k, w,
                             oob_end_windows=oob_end_windows)

    got_f = match_ops.find_matches(mres.hashes, mres.pos, mres.dedup_keep,
                                   index.fwd_hash, index.fwd_pos, budget)
    got_r = match_ops.find_matches(mres.hashes, mres.pos, mres.dedup_keep,
                                   index.rev_hash, index.rev_pos, budget)
    if use_pallas:
        from bioinfo1_tpu.ops import pallas_chain
        chain_fn = pallas_chain.lis_chain
    else:
        chain_fn = chain_ops.lis_chain
    cf = chain_fn(got_f.f_pos, got_f.r_pos, got_f.count)
    cr = chain_fn(got_r.f_pos, got_r.r_pos, got_r.count)

    use_fwd = cf.length >= cr.length          # ties forward (quirk #8)
    mapped = jnp.where(use_fwd, cf.length, cr.length) > 0
    overflow = got_f.overflow | got_r.overflow

    q_begin = jnp.where(use_fwd, cf.q_start, cr.q_start) - 1
    q_end = jnp.where(use_fwd, cf.q_end, cr.q_end) + k - 2
    t_begin = jnp.where(use_fwd, cf.t_start, cr.t_start) - 1
    t_end = jnp.where(use_fwd, cf.t_end, cr.t_end) + k - 2

    q_len = jnp.where(mapped, q_end - q_begin + 1, 0)
    t_len = jnp.where(mapped, t_end - t_begin + 1, 0)
    # Query regions are chain-bounded within the read, so the q window cap is
    # the read width L exactly; only target regions (which may span indels)
    # need the larger region_cap.  Halving the wavefront's lane count nearly
    # halves the alignment cost.
    region_over = t_len > region_cap
    overflow = overflow | region_over
    q_len = jnp.minimum(q_len, L)
    t_len = jnp.minimum(t_len, region_cap)

    q_win = _extract_windows(reads, jnp.maximum(q_begin, 0), L)
    strand_row = jnp.where(use_fwd, 0, 1)
    ref_flat = index.ref_bytes.reshape(-1)
    ref_pad = index.ref_bytes.shape[-1]
    t_base = strand_row * ref_pad + jnp.maximum(t_begin, 0)
    t_idx = t_base[:, None] + jnp.arange(region_cap, dtype=jnp.int32)[None, :]
    t_win = jnp.take(ref_flat, jnp.clip(t_idx, 0, 2 * ref_pad - 1))

    if use_pallas:
        from bioinfo1_tpu.ops import pallas_align as pa
        out = pa.align_scores(q_win, q_len, t_win, t_len, mode,
                              match, mismatch, gap)
    else:
        out = al.align_batch(q_win, q_len, t_win, t_len, mode,
                             match, mismatch, gap, want_parents=False)

    return MapOut(mapped=mapped & ~overflow, is_fwd=use_fwd,
                  q_begin=q_begin, q_end=q_end,
                  t_begin=t_begin, t_end=t_end,
                  score=out.score, overflow=overflow)
