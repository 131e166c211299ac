"""Seed matching: minimizer hashes vs the sorted-array reference index.

Replaces the reference's per-hash ``unordered_map`` probing
(team_mapper.cpp:627-638 / 716-729) with ``searchsorted`` + contiguous
gathers, which XLA vectorizes across the whole batch.

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
    count: (B,) int32 number of valid matches (pre-truncation count is
    ``total``; ``overflow`` flags reads whose matches were truncated - those
    reads must be retried with a larger budget for exact parity).
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


@functools.partial(jax.jit, static_argnames=("max_hits", "max_matches"))
def find_matches(min_hash: jax.Array, min_pos: jax.Array, keep: jax.Array,
                 idx_hash: jax.Array, idx_pos: jax.Array,
                 max_hits: int, max_matches: int) -> Matches:
    """Look up every kept minimizer in one strand's sorted index.

    Args:
      min_hash/min_pos/keep: (B, T) minimizer sweep output (keep = dedup mask).
      idx_hash/idx_pos: (U,) sorted-array strand index.
      max_hits: static per-minimizer hit budget; MUST be >= the index's
        max_bucket for exact parity (the caller sizes it from the index).
      max_matches: static per-read total match budget N.
    """
    B, T = min_hash.shape
    U = idx_hash.shape[0]
    if U == 0:
        z = jnp.zeros((B, max_matches), dtype=jnp.int32)
        zc = jnp.zeros((B,), dtype=jnp.int32)
        return Matches(f_pos=z, r_pos=z, count=zc, total=zc,
                       overflow=jnp.zeros((B,), dtype=bool))

    lo = jnp.searchsorted(idx_hash, min_hash, side="left")
    hi = jnp.searchsorted(idx_hash, min_hash, side="right")
    cnt = jnp.where(keep, hi - lo, 0)                      # (B, T)
    cnt = jnp.minimum(cnt, max_hits)

    hit_j = jnp.arange(max_hits, dtype=jnp.int32)          # (H,)
    take = lo[..., None] + hit_j[None, None, :]            # (B, T, H)
    hit_valid = hit_j[None, None, :] < cnt[..., None]
    r_pos = jnp.take(idx_pos, jnp.clip(take, 0, U - 1))
    f_pos = jnp.broadcast_to(min_pos[..., None], r_pos.shape)

    # Slot-major flatten preserves the reference's match order.
    flat_valid = hit_valid.reshape(B, T * max_hits)
    flat_f = f_pos.reshape(B, T * max_hits)
    flat_r = r_pos.reshape(B, T * max_hits)

    out_idx = jnp.cumsum(flat_valid, axis=1, dtype=jnp.int32) - 1
    total = jnp.where(flat_valid.shape[1] > 0,
                      out_idx[:, -1] + 1, 0).astype(jnp.int32)
    total = jnp.maximum(total, 0)
    in_range = flat_valid & (out_idx < max_matches)
    scatter_idx = jnp.where(in_range, out_idx, max_matches)

    rows = jnp.broadcast_to(jnp.arange(B)[:, None], scatter_idx.shape)
    buf_f = jnp.zeros((B, max_matches + 1), dtype=jnp.int32)
    buf_r = jnp.zeros((B, max_matches + 1), dtype=jnp.int32)
    buf_f = buf_f.at[rows, scatter_idx].set(jnp.where(in_range, flat_f, 0))
    buf_r = buf_r.at[rows, scatter_idx].set(jnp.where(in_range, flat_r, 0))

    count = jnp.minimum(total, max_matches)
    return Matches(f_pos=buf_f[:, :max_matches], r_pos=buf_r[:, :max_matches],
                   count=count, total=total,
                   overflow=total > max_matches)
