"""Device-side sequence encoding.

Implements the reference's 2-bit alphabet C=0 < A=1 < T=2 < G=3 with unknown
characters mapping to 0 (team_minimizers.cpp:70-86; the C++ uses
``unordered_map::operator[]`` whose default-insert yields 0), plus rolling
k-mer hashing.  All functions are jit-friendly: static shapes, no Python
branching on values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 256-entry ASCII -> 2-bit code table (uint32), unknowns = 0.
_CODE_TABLE = np.zeros(256, dtype=np.uint32)
_CODE_TABLE[ord("C")] = 0
_CODE_TABLE[ord("A")] = 1
_CODE_TABLE[ord("T")] = 2
_CODE_TABLE[ord("G")] = 3

# ASCII complement table for reverse-complement: A<->T, C<->G, else identity
# (matches the C++ switch in team_mapper.cpp:49-63).
_COMP_TABLE = np.arange(256, dtype=np.uint8)
for a, b in [("A", "T"), ("T", "A"), ("C", "G"), ("G", "C")]:
    _COMP_TABLE[ord(a)] = ord(b)

#: Sentinel hash for invalid k-mers; sorts after every real hash.  A real
#: k=16 all-G k-mer also hashes to 0xFFFFFFFF - harmless, because invalid
#: entries additionally carry a +inf position so leftmost tie-breaks still
#: prefer the real k-mer.
INVALID_HASH = np.uint32(0xFFFFFFFF)
INVALID_POS = np.int32(0x7FFFFFFF)


def seq_to_codes(seq_bytes: jax.Array) -> jax.Array:
    """(..., L) uint8 ASCII -> (..., L) uint32 2-bit codes.

    Arithmetic, not a table gather (element-serial gathers cost ~18 ms per
    512x4k batch on TPU; this is ~1 ms of VPU work): (b >> 1) & 3 maps
    A->0 C->1 T->2 G->3, and XOR-ing 1 below 2 swaps A/C into the
    reference's C=0 < A=1 < T=2 < G=3 order.  Non-ACGT bytes map to 0
    exactly like the reference's ``unordered_map::operator[]``
    default-insert (team_minimizers.cpp:73-78)."""
    b = seq_bytes.astype(jnp.uint32)
    x = (b >> 1) & 3
    x = x ^ (x < 2).astype(jnp.uint32)
    is_acgt = ((seq_bytes == ord("A")) | (seq_bytes == ord("C"))
               | (seq_bytes == ord("G")) | (seq_bytes == ord("T")))
    return jnp.where(is_acgt, x, 0)


def reverse_complement_bytes(seq_bytes: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-row reverse complement of right-padded (B, L) uint8 ASCII rows.

    Row i holds ``seq[:lengths[i]]``; the output holds the reverse complement
    in the same right-padded layout (padding bytes become arbitrary but are
    never read thanks to length masks downstream).
    """
    comp = jnp.asarray(_COMP_TABLE)[seq_bytes]
    L = seq_bytes.shape[-1]
    idx = lengths[..., None] - 1 - jnp.arange(L, dtype=jnp.int32)
    return jnp.take_along_axis(comp, jnp.clip(idx, 0, L - 1), axis=-1)


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_hashes(seq_bytes: jax.Array, lengths: jax.Array, k: int):
    """Rolling 2-bit MSB-first k-mer hashes.

    Args:
      seq_bytes: (B, L) uint8 ASCII, right-padded.
      lengths:   (B,) int32 true sequence lengths.
      k:         static k-mer length (the hash wraps mod 2^32 exactly like
                 the reference's ``unsigned int`` for k > 16).

    Returns:
      hashes: (B, NK) uint32 where NK = L - k + 1; invalid entries (k-mer
              start beyond length-k) hold INVALID_HASH.
      valid:  (B, NK) bool validity mask.
    """
    B, L = seq_bytes.shape
    if L < k:
        raise ValueError(f"padded length {L} < k={k}")
    nk = L - k + 1
    codes = seq_to_codes(seq_bytes)

    # Log-doubling instead of k single-base rounds: every round's shifted
    # slice costs a cross-lane relayout on TPU (~3 ms per 512x4k batch), so
    # round COUNT is the cost.  P[m](j) = codes[j..j+m) packed MSB-first;
    # P[2m](j) = P[m](j) << 2m | P[m](j+m), then k composes from its binary
    # decomposition - ceil(log2 k) + popcount(k) - 1 rounds (6 for k=15).
    def shl(x, bits):
        # Wrap-exact for k > 16 (the reference's unsigned int): a shift by
        # >= 32 IS the multiple of 2^32, i.e. zero (lax leaves it undefined).
        return (x << jnp.uint32(bits)) if bits < 32 else jnp.zeros_like(x)

    ladder = {1: codes}
    m = 1
    while 2 * m <= k:
        p = ladder[m]
        n2 = L - 2 * m + 1
        ladder[2 * m] = shl(p[:, :n2], 2 * m) | p[:, m:m + n2]
        m *= 2
    bits = [1 << i for i in range(31) if (1 << i) & k]
    bits.sort(reverse=True)
    h = ladder[bits[0]]
    off = bits[0]
    for b in bits[1:]:
        n = L - (off + b) + 1
        h = shl(h[:, :n], 2 * b) | ladder[b][:, off:off + n]
        off += b
    h = h[:, :nk]

    starts = jnp.arange(nk, dtype=jnp.int32)[None, :]
    valid = starts <= (lengths[:, None] - k)
    hashes = jnp.where(valid, h, INVALID_HASH)
    return hashes, valid
