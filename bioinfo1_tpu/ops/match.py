"""Seed matching: minimizer hashes vs the sorted-array reference index.

Replaces the reference's per-hash ``unordered_map`` probing
(team_mapper.cpp:627-638 / 716-729) with ``searchsorted`` + gathers, which
XLA vectorizes across the whole batch.

Design: the per-read match list is the concatenation, over minimizer slots,
of that slot's index bucket ranges.  Rather than materializing a
(B, T, max_hits) tile (quadratic blowup on repetitive genomes), each of the
N output slots finds its source via a prefix-sum + binary search:

    cnt[t]  = bucket size of slot t          (searchsorted hi - lo)
    cum     = inclusive prefix sum of cnt
    slot(j) = first t with cum[t] > j        (vmapped searchsorted)
    match j = idx_pos[lo[slot(j)] + (j - cum[slot(j)-1])]

Cost is O(B*T log U + B*N log T) with no hit cap - exact for any bucket
distribution; ``total`` > N sets ``overflow`` and the caller retries that
read with a doubled budget.

Order contract (load-bearing for LIS parity): matches are emitted in
(dedup'd minimizer slot order) x (ascending reference position) - identical
to the reference's iteration over the fragment minimizer vector and each
``set<pair<pos,strand>>``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Matches:
    """Compacted per-read match lists.

    f_pos / r_pos: (B, N) int32 1-based positions, right-padded with 0.
    count: (B,) int32 number of valid matches; ``total`` is the exact
    pre-truncation count; ``overflow`` flags reads whose matches were
    truncated - those reads must be retried with a larger budget.
    """

    f_pos: jax.Array
    r_pos: jax.Array
    count: jax.Array
    total: jax.Array
    overflow: jax.Array


@jax.jit
def hash_present(idx_hash: jax.Array, min_hash: jax.Array) -> jax.Array:
    """(B, T) bool: is each minimizer hash present in the sorted index?

    Used for the ``fasta_match_nesting`` bug-compat mode where reverse-index
    lookups are gated on a forward-index hit (team_mapper.cpp:629-638).
    """
    if idx_hash.shape[0] == 0:
        return jnp.zeros(min_hash.shape, dtype=bool)
    lo = jnp.searchsorted(idx_hash, min_hash, side="left")
    lo = jnp.clip(lo, 0, idx_hash.shape[0] - 1)
    return idx_hash[lo] == min_hash


@functools.partial(jax.jit, static_argnames=("max_matches",))
def find_matches(min_hash: jax.Array, min_pos: jax.Array, keep: jax.Array,
                 idx_hash: jax.Array, idx_pos: jax.Array,
                 max_matches: int) -> Matches:
    """Look up every kept minimizer in one strand's sorted index.

    Args:
      min_hash/min_pos/keep: (B, T) minimizer sweep output (keep = dedup mask).
      idx_hash/idx_pos: (U,) sorted-array strand index ((hash, pos) lexsort).
      max_matches: static per-read match budget N.
    """
    B, T = min_hash.shape
    U = idx_hash.shape[0]
    N = max_matches
    if U == 0 or T == 0:
        z = jnp.zeros((B, N), dtype=jnp.int32)
        zc = jnp.zeros((B,), dtype=jnp.int32)
        return Matches(f_pos=z, r_pos=z, count=zc, total=zc,
                       overflow=jnp.zeros((B,), dtype=bool))

    lo = jnp.searchsorted(idx_hash, min_hash, side="left")      # (B, T)
    hi = jnp.searchsorted(idx_hash, min_hash, side="right")
    cnt = jnp.where(keep, hi - lo, 0).astype(jnp.int32)
    cum = jnp.cumsum(cnt, axis=1, dtype=jnp.int32)              # inclusive
    total = cum[:, -1]

    j = jnp.arange(N, dtype=jnp.int32)                          # (N,)
    # slot(j) = first t with cum[t] > j  (== searchsorted right over cum)
    slot = jax.vmap(
        lambda c: jnp.searchsorted(c, j, side="right"))(cum)    # (B, N)
    slot_c = jnp.clip(slot, 0, T - 1)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    prev = jnp.where(slot_c > 0, cum[rows, slot_c - 1], 0)
    offset = j[None, :] - prev
    take = jnp.clip(lo[rows, slot_c] + offset, 0, U - 1)
    valid = j[None, :] < jnp.minimum(total, N)[:, None]

    r_pos = jnp.where(valid, jnp.take(idx_pos, take), 0)
    f_pos = jnp.where(valid, min_pos[rows, slot_c], 0)

    count = jnp.minimum(total, N)
    return Matches(f_pos=f_pos.astype(jnp.int32),
                   r_pos=r_pos.astype(jnp.int32),
                   count=count, total=total, overflow=total > N)
