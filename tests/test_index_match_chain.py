"""Index build, seed matching, and LIS chaining vs the executable spec."""

import random

import jax
import numpy as np
import pytest

from bioinfo1_tpu import reference_model as rm
from bioinfo1_tpu.index import builder
from bioinfo1_tpu.ops import chain as chain_ops
from bioinfo1_tpu.ops import match as match_ops
from bioinfo1_tpu.ops import minimizer as mz


def _rand_genome(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _index_to_dict(strand: builder.StrandIndexArrays):
    d = {}
    for h, p in zip(strand.hash_sorted, strand.pos_sorted):
        d.setdefault(int(h), []).append(int(p))
    return d


@pytest.mark.parametrize("seed,f", [(0, 0.0), (1, 0.001), (2, 0.01), (3, 0.3)])
def test_index_matches_spec(seed, f):
    rng = random.Random(seed)
    genome = _rand_genome(rng, 3000)
    k, w = 9, 4
    got = builder.build_index(genome, k, w, f)
    want = rm.build_index(genome, k, w, f)
    for strand_got, strand_want in [(got.fwd, want.fwd), (got.rev, want.rev)]:
        assert _index_to_dict(strand_got) == strand_want.index
        assert strand_got.n_unique_tuples == strand_want.n_unique_tuples
        assert set(int(h) for h in strand_got.banned) == strand_want.banned
        assert strand_got.n_distinct_hashes == len(strand_want.frequencies)
        assert strand_got.n_singleton_hashes == sum(
            1 for c in strand_want.frequencies.values() if c == 1)


def test_index_banned_rev_from_fwd_bug():
    rng = random.Random(5)
    genome = _rand_genome(rng, 2000)
    got = builder.build_index(genome, 7, 3, 0.05, banned_rev_from_fwd=True)
    want = rm.build_index(genome, 7, 3, 0.05, banned_rev_from_fwd=True)
    assert _index_to_dict(got.rev) == want.rev.index
    assert set(int(h) for h in got.rev.banned) == want.rev.banned


def _pack(seqs, k, w):
    L = max(max(len(s) for s in seqs), k + w - 1)
    arr = np.zeros((len(seqs), L), dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, :len(s)] = np.frombuffer(s.encode("latin1"), dtype=np.uint8)
        lens[i] = len(s)
    return arr, lens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_and_chain_vs_spec(seed):
    rng = random.Random(seed)
    genome = _rand_genome(rng, 4000)
    k, w, f = 11, 5, 0.0
    idx = builder.build_index(genome, k, w, f)
    spec_idx = rm.build_index(genome, k, w, f)

    reads = []
    for i in range(8):
        start = rng.randrange(0, len(genome) - 400)
        frag = genome[start:start + rng.randrange(150, 400)]
        if rng.random() < 0.5:
            frag = rm.reverse_complement(frag)
        reads.append(frag)

    arr, lens = _pack(reads, k, w)
    mres = mz.minimize_batch(arr, lens, k, w)

    got_f = match_ops.find_matches(
        mres.hashes, mres.pos, mres.dedup_keep,
        idx.fwd.hash_sorted, idx.fwd.pos_sorted, 2048)
    got_r = match_ops.find_matches(
        mres.hashes, mres.pos, mres.dedup_keep,
        idx.rev.hash_sorted, idx.rev.pos_sorted, 2048)
    chain_f = chain_ops.lis_chain(got_f.f_pos, got_f.r_pos, got_f.count)
    chain_r = chain_ops.lis_chain(got_r.f_pos, got_r.r_pos, got_r.count)

    for i, read in enumerate(reads):
        frag_min = rm.remove_duplicates(rm.minimize(read, k, w).minimizers)
        want_f, want_r = rm.find_matches(frag_min, spec_idx)

        nf = int(got_f.count[i])
        assert not bool(got_f.overflow[i])
        got_list_f = list(zip(jax.device_get(got_f.f_pos[i])[:nf].tolist(),
                              jax.device_get(got_f.r_pos[i])[:nf].tolist()))
        assert got_list_f == want_f, f"read {i} fwd matches"

        nr = int(got_r.count[i])
        got_list_r = list(zip(jax.device_get(got_r.f_pos[i])[:nr].tolist(),
                              jax.device_get(got_r.r_pos[i])[:nr].tolist()))
        assert got_list_r == want_r, f"read {i} rev matches"

        for cres, want_matches in [(chain_f, want_f), (chain_r, want_r)]:
            want_chain = rm.find_lis(want_matches)
            assert int(cres.length[i]) == len(want_chain)
            if want_chain:
                assert (int(cres.q_start[i]), int(cres.t_start[i])) == want_chain[0]
                assert (int(cres.q_end[i]), int(cres.t_end[i])) == want_chain[-1]


def test_match_overflow_flag():
    genome = "ACGT" * 300  # highly repetitive: huge buckets
    k, w = 5, 3
    idx = builder.build_index(genome, k, w, 0.0)
    arr, lens = _pack([genome[:100]], k, w)
    mres = mz.minimize_batch(arr, lens, k, w)
    res = match_ops.find_matches(
        mres.hashes, mres.pos, mres.dedup_keep,
        idx.fwd.hash_sorted, idx.fwd.pos_sorted, 16)
    assert bool(res.overflow[0])
    assert int(res.count[0]) == 16


def test_lis_chain_direct_cases():
    # Mirrors test_lis_unsigned_wrap_semantics at the kernel level.
    cases = [
        [(10, 5), (5, 8)],
        [(5, 5), (10, 8)],
        [(5, 5), (10, 6000)],
        [(1, 1), (2, 2), (3, 3), (2, 4), (4, 4)],
        [(7, 3)],
    ]
    N = 8
    B = len(cases)
    f = np.zeros((B, N), dtype=np.int32)
    r = np.zeros((B, N), dtype=np.int32)
    cnt = np.zeros((B,), dtype=np.int32)
    for i, c in enumerate(cases):
        for j, (ff, rr) in enumerate(c):
            f[i, j], r[i, j] = ff, rr
        cnt[i] = len(c)
    res = chain_ops.lis_chain(f, r, cnt)
    for i, c in enumerate(cases):
        want = rm.find_lis(c)
        assert int(res.length[i]) == len(want)
        assert (int(res.q_start[i]), int(res.t_start[i])) == want[0]
        assert (int(res.q_end[i]), int(res.t_end[i])) == want[-1]
