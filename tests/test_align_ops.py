"""Wavefront alignment kernel vs the executable spec: scores, goal cells,
and CIGAR tracebacks across all three modes and scoring parameter sets."""

import random

import jax
import numpy as np
import pytest

from bioinfo1_tpu import reference_model as rm
from bioinfo1_tpu.ops import align as al
from bioinfo1_tpu.utils import cigar as cg


def _pack(seqs, pad):
    arr = np.zeros((len(seqs), pad), dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, :len(s)] = np.frombuffer(s.encode("latin1"), dtype=np.uint8)
        lens[i] = len(s)
    return arr, lens


def _run(pairs, mode, match, mismatch, gap, want_parents=True):
    qs = [p[0] for p in pairs]
    ts = [p[1] for p in pairs]
    qpad = max(len(s) for s in qs)
    tpad = max(len(s) for s in ts)
    qa, ql = _pack(qs, qpad)
    ta, tl = _pack(ts, tpad)
    return al.align_batch(qa, ql, ta, tl, al.MODE_BY_NAME[mode],
                          match, mismatch, gap, want_parents=want_parents)


PARAMS = [(1, -1, -1), (2, -1, -2), (3, -2, -1), (2, -1, 2), (1, -3, 0)]
MODES = ["global", "local", "semiGlobal"]


def _rand_pairs(seed, count, maxlen=60):
    rng = random.Random(seed)
    pairs = []
    for _ in range(count):
        q = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, maxlen)))
        t = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, maxlen)))
        pairs.append((q, t))
    # related pair: mutated copy
    base = "".join(rng.choice("ACGT") for _ in range(40))
    mut = "".join(c if rng.random() > 0.1 else rng.choice("ACGT") for c in base)
    pairs.append((base, mut))
    return pairs


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("params", PARAMS)
def test_scores_goals_cigars_vs_spec(mode, params):
    match, mismatch, gap = params
    pairs = _rand_pairs(hash((mode, params)) % 1000, 12)
    out = _run(pairs, mode, match, mismatch, gap)
    parents = jax.device_get(out.parents)
    for b, (q, t) in enumerate(pairs):
        want = rm.align(q, t, mode, match, mismatch, gap, want_cigar=True)
        got_score = int(out.score[b])
        assert got_score == want.score, (mode, params, q, t)
        cigar, tb = cg.traceback(
            parents[:, b, :], q, t, int(out.goal_i[b]), int(out.goal_j[b]),
            mode, got_score, match, mismatch, gap)
        assert cigar == want.cigar, (mode, params, q, t)
        if mode == "local":
            assert tb == want.target_begin
        elif mode == "global":
            assert tb == 0


def test_bundled_example_pairs():
    """The four bundled example FASTA pairs exercise each mode's textbook case."""
    from bioinfo1_tpu.io import fastx
    from tests.conftest import REFERENCE_DIR
    import os
    cases = [
        ("1_primjer_globalno_poravnanje.fasta.txt", "global"),
        ("1_primjer_globalno_poravnanje2.fasta.txt", "global"),
        ("2_primjer_poluGlobalno_poravnanje.fasta.txt", "semiGlobal"),
        ("3_primjer_lokalno_poravnanje.fasta.txt", "local"),
    ]
    for fname, mode in cases:
        path = os.path.join(REFERENCE_DIR, fname)
        if not os.path.exists(path):
            pytest.skip("reference examples unavailable")
        recs = fastx.parse_fasta(path)
        q, t = recs[0][1], recs[1][1]
        want = rm.align(q, t, mode, 1, -1, -1, want_cigar=True)
        out = _run([(q, t)], mode, 1, -1, -1)
        assert int(out.score[0]) == want.score
        cigar, _ = cg.traceback(
            jax.device_get(out.parents)[:, 0, :], q, t,
            int(out.goal_i[0]), int(out.goal_j[0]), mode,
            int(out.score[0]), 1, -1, -1)
        assert cigar == want.cigar


def test_mixed_lengths_padding_isolation():
    """Rows must not contaminate each other despite shared padding."""
    pairs = [("A", "A"), ("ACGTACGTACGT", "ACGT"), ("AC", "ACGTACGTACGTACGTAAAA"),
             ("GGGG", "CCCC")]
    for mode in MODES:
        out = _run(pairs, mode, 1, -1, -1)
        for b, (q, t) in enumerate(pairs):
            want = rm.align(q, t, mode, 1, -1, -1, want_cigar=False)
            assert int(out.score[b]) == want.score, (mode, q, t)


def test_dash_characters_cost_zero():
    q, t = "AC-GT", "ACGT"
    for mode in MODES:
        want = rm.align(q, t, mode, 1, -1, -1, want_cigar=True)
        out = _run([(q, t)], mode, 1, -1, -1)
        assert int(out.score[0]) == want.score
        cigar, _ = cg.traceback(
            jax.device_get(out.parents)[:, 0, :], q, t,
            int(out.goal_i[0]), int(out.goal_j[0]), mode,
            int(out.score[0]), 1, -1, -1)
        assert cigar == want.cigar


def test_sam_convention_swaps_letters():
    assert cg.compress("MIIDM", sam_convention=True) == "1M2D1I1M"
    assert cg.compress("MIIDM") == "1M2I1D1M"
