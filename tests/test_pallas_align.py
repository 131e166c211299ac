"""Pallas wavefront score kernel vs the lax reference implementation.

Runs in the Pallas interpreter on the CPU test backend; the compiled path is
exercised on real TPU by bench.py.
"""

import random

import jax
import numpy as np
import pytest

from bioinfo1_tpu.ops import align as al
from bioinfo1_tpu.ops import pallas_align as pa


def _pack(seqs, pad):
    arr = np.zeros((len(seqs), pad), dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, :len(s)] = np.frombuffer(s.encode("latin1"), dtype=np.uint8)
        lens[i] = len(s)
    return arr, lens


def _rand_pairs(seed, count, maxlen=90):
    rng = random.Random(seed)
    pairs = []
    for _ in range(count):
        q = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, maxlen)))
        t = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, maxlen)))
        pairs.append((q, t))
    base = "".join(rng.choice("ACGT") for _ in range(60))
    mut = "".join(c if rng.random() > 0.1 else rng.choice("ACGT") for c in base)
    pairs.append((base, mut))
    pairs.append(("AC-GT", "ACGT"))          # dash cost-0 path
    return pairs


@pytest.mark.parametrize("mode", [0, 1, 2])
@pytest.mark.parametrize("params", [(1, -1, -1), (2, -1, -2), (2, -1, 2)])
def test_pallas_matches_lax(mode, params):
    match, mismatch, gap = params
    pairs = _rand_pairs(7 * mode + match, 10)
    qs = [p[0] for p in pairs]
    ts = [p[1] for p in pairs]
    qa, ql = _pack(qs, max(len(s) for s in qs))
    ta, tl = _pack(ts, max(len(s) for s in ts))

    want = al.align_batch(qa, ql, ta, tl, mode, match, mismatch, gap)
    got = pa.align_scores(qa, ql, ta, tl, mode, match, mismatch, gap,
                          interpret=True)
    np.testing.assert_array_equal(jax.device_get(got.score),
                                  jax.device_get(want.score))
    np.testing.assert_array_equal(jax.device_get(got.goal_i),
                                  jax.device_get(want.goal_i))
    np.testing.assert_array_equal(jax.device_get(got.goal_j),
                                  jax.device_get(want.goal_j))


def test_pallas_batch_padding_isolation():
    pairs = [("A", "A"), ("ACGTACGTACGT", "ACGT"),
             ("AC", "ACGTACGTACGTACGTAAAA"), ("GGGG", "CCCC")] * 3
    qa, ql = _pack([p[0] for p in pairs], 16)
    ta, tl = _pack([p[1] for p in pairs], 32)
    for mode in (0, 1, 2):
        want = al.align_batch(qa, ql, ta, tl, mode, 1, -1, -1)
        got = pa.align_scores(qa, ql, ta, tl, mode, 1, -1, -1, interpret=True)
        np.testing.assert_array_equal(jax.device_get(got.score),
                                      jax.device_get(want.score))
