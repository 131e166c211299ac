"""Device minimizer kernel vs the executable spec."""

import random

import jax
import numpy as np
import pytest

from bioinfo1_tpu import reference_model as rm
from bioinfo1_tpu.ops import minimizer as mz
from bioinfo1_tpu.ops.encode import INVALID_HASH


def _pack(seqs, pad_to=None):
    L = max(len(s) for s in seqs)
    if pad_to:
        L = max(L, pad_to)
    arr = np.zeros((len(seqs), L), dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, :len(s)] = np.frombuffer(s.encode("latin1"), dtype=np.uint8)
        lens[i] = len(s)
    return arr, lens


def _device_minimizers(seqs, k, w, pad_to=None):
    arr, lens = _pack(seqs, pad_to=max(pad_to or 0, k + w - 1))
    res = mz.minimize_batch(arr, lens, k, w)
    out = []
    for i in range(len(seqs)):
        v = jax.device_get(res.valid[i])
        h = jax.device_get(res.hashes[i])[v]
        p = jax.device_get(res.pos[i])[v]
        out.append([(int(hh), int(pp), True) for hh, pp in zip(h, p)])
    return res, out


@pytest.mark.parametrize("k,w", [(3, 2), (3, 3), (5, 5), (15, 5), (4, 1), (2, 7)])
@pytest.mark.parametrize("seed", [0, 1])
def test_minimize_matches_spec_random(k, w, seed):
    rng = random.Random(seed * 100 + k * 10 + w)
    seqs = ["".join(rng.choice("ACGT") for _ in range(rng.randrange(k + w, 400)))
            for _ in range(8)]
    _, got = _device_minimizers(seqs, k, w)
    for s, g in zip(seqs, got):
        want = rm.minimize(s, k, w).minimizers
        assert g == want, f"k={k} w={w} len={len(s)}"


@pytest.mark.parametrize("k,w", [(3, 2), (15, 5), (3, 5)])
def test_minimize_short_and_edge_lengths(k, w):
    # Lengths straddling every emission boundary: < k, == k, k..k+2w.
    seqs = []
    rng = random.Random(42)
    for L in range(1, k + 2 * w + 2):
        seqs.append("".join(rng.choice("ACGT") for _ in range(L)))
    _, got = _device_minimizers(seqs, k, w)
    for s, g in zip(seqs, got):
        want = rm.minimize(s, k, w).minimizers
        assert g == want, f"k={k} w={w} len={len(s)}"


def test_minimize_worked_example():
    """The report's worked example sequence, k=3 w=2."""
    _, got = _device_minimizers(["TGACGTACATGGACA"], 3, 2)
    want = rm.minimize("TGACGTACATGGACA", 3, 2).minimizers
    assert got[0] == want


def test_dedup_keep_is_order_preserving_first_occurrence():
    rng = random.Random(3)
    seqs = ["".join(rng.choice("ACGT") for _ in range(200)) for _ in range(4)]
    res, _ = _device_minimizers(seqs, 5, 5)
    for i, s in enumerate(seqs):
        v = jax.device_get(res.valid[i])
        keep = jax.device_get(res.dedup_keep[i])
        h = jax.device_get(res.hashes[i])
        p = jax.device_get(res.pos[i])
        got = [(int(h[t]), int(p[t]), True) for t in range(len(v)) if keep[t]]
        want = rm.remove_duplicates(rm.minimize(s, 5, 5).minimizers)
        assert got == want
        assert not np.any(keep & ~v)


def test_window_frequencies_match_spec():
    rng = random.Random(9)
    s = "".join(rng.choice("ACGT") for _ in range(500))
    arr, lens = _pack([s])
    res = mz.minimize_batch(arr, lens, 5, 5)
    spec = rm.minimize(s, 5, 5)
    uniq = np.array(sorted(spec.frequencies.keys()), dtype=np.uint32)
    counts = jax.device_get(mz.window_frequencies(res.hashes, res.valid, uniq))
    for hsh, cnt in zip(uniq, counts):
        assert spec.frequencies[int(hsh)] == int(cnt)


def test_invalid_slots_are_sentinels():
    arr, lens = _pack(["ACGTACG", "AC"], pad_to=32)
    res = mz.minimize_batch(arr, lens, 3, 3)
    v = jax.device_get(res.valid)
    assert not v[1].any()  # length 2 < k: nothing emitted
    assert (jax.device_get(res.hashes)[~v] == INVALID_HASH).all()


def test_oob_end_windows_mode_vs_spec():
    """Bug-compat prefix windows on short sequences (reference bug #4)."""
    from bioinfo1_tpu import reference_model as rm
    k, w = 15, 5
    seqs = ["ACGTACGTACGTACGTA",      # 17 bp: 1-byte overrun (the NUL case)
            "ACGTACGTACGTACG",       # 15 bp
            "ACGTACGTACGTACGTACGTACGT"]  # 24 bp: no overrun
    L = 32
    arr = np.zeros((len(seqs), L), dtype=np.uint8)
    lens = np.zeros((len(seqs),), dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, :len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)
        lens[i] = len(s)
    res = mz.minimize_batch(arr, lens, k, w, oob_end_windows=True)
    for i, s in enumerate(seqs):
        want = rm.minimize(s, k, w, oob_end_windows=True)
        v = jax.device_get(res.valid[i])
        got = list(zip(jax.device_get(res.hashes[i])[v].tolist(),
                       jax.device_get(res.pos[i])[v].tolist()))
        assert got == [(h, p) for h, p, _ in want.minimizers], s


def test_kmer_hashes_wrap_exact_all_k():
    """The log-doubling hash composition must stay wrap-exact (mod 2^32,
    the reference's unsigned int) for every k incl. > 16, where partial
    shifts reach/exceed the 32-bit width."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bioinfo1_tpu.ops.encode import kmer_hashes, _CODE_TABLE

    rng = np.random.default_rng(0)
    seq = np.frombuffer(b"CATG", dtype=np.uint8)[rng.integers(0, 4, (3, 100))]
    for k in (2, 3, 7, 15, 16, 17, 31, 33):
        lens = np.array([100, 60, k], np.int32)
        got, valid = jax.device_get(
            kmer_hashes(jnp.asarray(seq), jnp.asarray(lens), k))
        codes = _CODE_TABLE[seq]
        nk = 100 - k + 1
        want = np.zeros((3, nk), np.uint32)
        for j in range(k):
            want = (want << np.uint32(2)) | codes[:, j:j + nk].astype(
                np.uint32)
        m = np.asarray(valid)
        assert np.array_equal(got[m], want[m]), k
