"""Batched minimizer extraction on device.

TPU-first re-design of KMER::Minimize (team_minimizers.cpp:122-225).  The
reference walks a deque per window and rescans it for the minimum - O(L*w*k)
scalar work.  Here the whole batch is processed as fixed-shape vector ops:
rolling k-mer hashes once (O(L*k) fused shifts), then an incremental
window-min ladder that reuses the size-(s-1) window minima to build size-s
minima, O(L*w) total, fully parallel over reads and positions.

Emit-order contract (load-bearing for LIS parity; see reference_model.minimize):
slot layout per read is

  [prefix windows s=1..w-1][dense windows start=0..NK-w][suffix windows s=1..w-1]

with 1-based positions and leftmost-minimum tie-breaking.  Duplicate window
winners are retained (the reference returns them all); ``dedup_keep`` marks
the order-preserving first occurrence of each (hash, pos), replacing the
reference's stringified-hash-set dedup (team_mapper.cpp:28-45).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from bioinfo1_tpu.ops.encode import INVALID_HASH, INVALID_POS, kmer_hashes


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Minimizers:
    """Fixed-shape minimizer sweep result.

    hashes: (B, T) uint32; pos: (B, T) int32 1-based; valid: (B, T) bool.
    dedup_keep: (B, T) bool - valid AND first occurrence of (hash, pos).
    T = 2*(w-1) + (L - k + 1) - (w - 1) slots (see module docstring).
    """

    hashes: jax.Array
    pos: jax.Array
    valid: jax.Array
    dedup_keep: jax.Array


def _combine(h1, p1, h2, p2):
    """Leftmost-min combine: first argument wins ties (strict < scan)."""
    take1 = (h1 < h2) | ((h1 == h2) & (p1 <= p2))
    return jnp.where(take1, h1, h2), jnp.where(take1, p1, p2)


def num_slots(padded_len: int, k: int, w: int) -> int:
    nk = padded_len - k + 1
    ndense = max(nk - w + 1, 0)
    return 2 * (w - 1) + ndense


@functools.partial(jax.jit, static_argnames=("k", "w", "oob_end_windows"))
def minimize_batch(seq_bytes: jax.Array, lengths: jax.Array,
                   k: int, w: int,
                   oob_end_windows: bool = False) -> Minimizers:
    """Reference-exact minimizer sweep over a padded batch.

    Args:
      seq_bytes: (B, L) uint8 ASCII, right-padded with zeros.
      lengths:   (B,) int32.
      k, w:      static minimizer parameters (w >= 1, L >= k).
      oob_end_windows: replicate reference bug #4 - unguarded prefix
        end-windows hash k-mers past the sequence end.  The zero padding of
        this batch plays the role of the c_str() NUL (see
        reference_model.minimize docstring).
    """
    B, L = seq_bytes.shape
    if L < k + w - 1:
        raise ValueError(f"padded length {L} must be >= k+w-1={k + w - 1}; "
                         "pad the batch up")
    h, kvalid = kmer_hashes(seq_bytes, lengths, k)
    nk_max = L - k + 1
    nk = jnp.maximum(lengths - k + 1, 0)  # (B,) valid k-mer count

    base_pos = jnp.arange(nk_max, dtype=jnp.int32)[None, :] + 1  # 1-based
    pos = jnp.where(kvalid, base_pos, INVALID_POS)

    if oob_end_windows:
        # Raw zero-extended hashes for a separate prefix-window ladder: the
        # reference's prefix loop has no length guard, so OOB k-mers (their
        # bytes 0-filled here) participate with their real positions.
        # kmer_hashes masked invalid entries; recompute unmasked over the
        # padded bytes (padding is 0 already).
        from bioinfo1_tpu.ops.encode import seq_to_codes
        codes = seq_to_codes(seq_bytes)
        hr = jnp.zeros((B, nk_max), dtype=jnp.uint32)
        for j in range(k):
            hr = (hr << 2) | codes[:, j:j + nk_max]
        oh, op = hr, jnp.broadcast_to(base_pos, (B, nk_max))
        owh, owp = oh, op

    ndense = max(nk_max - w + 1, 0)

    prefix_h, prefix_p = [], []   # windows of k-mers [0, s-1], s = 1..w-1
    suffix_lh, suffix_lp = [], []  # ladder LEVELS for the suffix windows
    wh, wp = h, pos               # window minima ladder, current size s
    for s in range(1, w + 1):
        if s > 1:
            wh, wp = _combine(wh[:, : nk_max - s + 1], wp[:, : nk_max - s + 1],
                              h[:, s - 1:], pos[:, s - 1:])
            if oob_end_windows:
                owh, owp = _combine(owh[:, : nk_max - s + 1],
                                    owp[:, : nk_max - s + 1],
                                    oh[:, s - 1:], op[:, s - 1:])
        if s < w:
            # Prefix end-window of size s anchors at start 0.  Fixed mode:
            # invalid k-mers carry +inf sentinels so short sequences clamp
            # to their valid k-mers.  Bug-compat mode: the unguarded ladder.
            if oob_end_windows:
                prefix_h.append(owh[:, 0])
                prefix_p.append(owp[:, 0])
            else:
                prefix_h.append(wh[:, 0])
                prefix_p.append(wp[:, 0])
            # Suffix end-window of size s anchors at start nk - s (dynamic
            # per read).  Stash the ladder level; all w-1 suffix picks fuse
            # into ONE take_along_axis below (2(w-1) element-serial (B,)
            # gathers were a measurable slice of the minimize stage).
            suffix_lh.append(jnp.pad(wh, ((0, 0), (0, s - 1)),
                                     constant_values=INVALID_HASH))
            suffix_lp.append(jnp.pad(wp, ((0, 0), (0, s - 1)),
                                     constant_values=INVALID_POS))
    if w > 1:
        lvl_h = jnp.stack(suffix_lh, axis=1)          # (B, w-1, nk_max)
        lvl_p = jnp.stack(suffix_lp, axis=1)
        s_all = jnp.arange(1, w, dtype=jnp.int32)[None, :]
        idx_all = jnp.clip(nk[:, None] - s_all, 0,
                           jnp.maximum(nk_max - s_all, 0))[:, :, None]
        suffix_h = jnp.take_along_axis(lvl_h, idx_all, axis=2)[:, :, 0]
        suffix_p = jnp.take_along_axis(lvl_p, idx_all, axis=2)[:, :, 0]

    parts_h, parts_p, parts_v = [], [], []
    if w > 1:
        pre_h = jnp.stack(prefix_h, axis=1)
        pre_p = jnp.stack(prefix_p, axis=1)
        pre_v = jnp.broadcast_to((nk >= 1)[:, None], pre_h.shape)
        parts_h.append(pre_h)
        parts_p.append(pre_p)
        parts_v.append(pre_v)
    if ndense > 0:
        dense_h = wh[:, :ndense]
        dense_p = wp[:, :ndense]
        starts = jnp.arange(ndense, dtype=jnp.int32)[None, :]
        dense_v = starts <= (nk - w)[:, None]
        parts_h.append(dense_h)
        parts_p.append(dense_p)
        parts_v.append(dense_v)
    if w > 1:
        # Suffix window of size s is emitted iff L >= k + s - 1, i.e. nk >= s
        # (team_minimizers.cpp:198 guard).
        s_idx = jnp.arange(1, w, dtype=jnp.int32)[None, :]
        suf_v = nk[:, None] >= s_idx
        parts_h.append(suffix_h)
        parts_p.append(suffix_p)
        parts_v.append(suf_v)

    hashes = jnp.concatenate(parts_h, axis=1)
    positions = jnp.concatenate(parts_p, axis=1)
    valid = jnp.concatenate(parts_v, axis=1)
    hashes = jnp.where(valid, hashes, INVALID_HASH)
    positions = jnp.where(valid, positions, INVALID_POS)
    dedup = _first_occurrence_mask(hashes, positions, valid, w)
    return Minimizers(hashes=hashes, pos=positions, valid=valid,
                      dedup_keep=dedup)


def _first_occurrence_mask(hashes, positions, valid, w):
    """Order-preserving first-occurrence mask of (hash, pos) per row.

    Exploits the emit-order structure instead of sorting: within the
    [prefix windows][dense windows] part of the layout, duplicate (hash,
    pos) winners are provably CONSECUTIVE, so a compare-with-previous-slot
    pass finds them all.  Proof sketch (leftmost-min tie rule throughout):

      * dense windows: if (h, p) wins windows s1 < s2 then p lies in both,
        so every window between them contains p and is covered by the union
        of s1's and s2's ranges - a better winner in between would have
        beaten (h, p) in s1 or s2;
      * growing prefix windows [0, s): winners are min-monotone, so equal
        winners are adjacent in s;
      * a dense window duplicating a prefix winner forces the whole dense
        run back to window 0, whose winner then equals the size-(w-1)
        prefix winner - the immediately preceding slot.

    Only the trailing w-1 SUFFIX slots can duplicate a non-adjacent slot
    (their windows re-cover the sequence tail the dense sweep already
    emitted), so each of them is checked exactly against all earlier slots
    - (w-1) broadcast compares over (B, T).

    This replaces a 3-key batched lax.sort + scatter (~169 bitonic passes
    at T ~ 8k) with ~6 + 4*(w-1) vector passes: the sort was the minimize
    stage's dominant cost (59 ms of a 177 ms front half per 512 x 8 kb
    batch).
    """
    B, T = hashes.shape
    same_prev = jnp.concatenate([
        jnp.zeros((B, 1), dtype=bool),
        (hashes[:, 1:] == hashes[:, :-1])
        & (positions[:, 1:] == positions[:, :-1]) & valid[:, :-1],
    ], axis=1)
    keep = valid & ~same_prev
    ns = min(w - 1, T - 1)
    if ns <= 0:
        return keep
    lanes = jnp.arange(T, dtype=jnp.int32)[None, :]
    cols = []
    for j in range(ns):
        e = T - ns + j
        dup = jnp.any((lanes < e) & valid
                      & (hashes == hashes[:, e][:, None])
                      & (positions == positions[:, e][:, None]), axis=1)
        cols.append(valid[:, e] & ~dup)
    return jnp.concatenate([keep[:, :T - ns],
                            jnp.stack(cols, axis=1)], axis=1)


def window_frequencies(hashes: jax.Array, valid: jax.Array,
                       sorted_unique_hashes: jax.Array) -> jax.Array:
    """Count window wins per distinct hash (KMER frequency histogram,
    team_minimizers.cpp:166-169: every emitted window counts, duplicates
    included).

    Args:
      hashes/valid: (B, T) sweep output (typically B=1 for the genome).
      sorted_unique_hashes: (U,) ascending distinct hashes to count into.
    Returns:
      (U,) int32 counts.
    """
    flat = hashes.reshape(-1)
    fvalid = valid.reshape(-1)
    idx = jnp.searchsorted(sorted_unique_hashes, flat)
    idx = jnp.clip(idx, 0, sorted_unique_hashes.shape[0] - 1)
    hit = fvalid & (sorted_unique_hashes[idx] == flat)
    contrib = jnp.where(hit, 1, 0)
    return jnp.zeros(sorted_unique_hashes.shape[0], dtype=jnp.int32).at[idx].add(
        contrib)
