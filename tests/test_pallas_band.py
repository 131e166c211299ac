"""Banded wavefront kernel vs the full lax DP.

Certified scores must equal the full DP exactly; the map_step integration
must be exact even on adversarial inputs (certificate fails -> in-jit
full-kernel fallback).  Runs in the Pallas interpreter on the CPU backend;
the compiled path is exercised on real TPU by bench.py.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioinfo1_tpu.ops import align as al
from bioinfo1_tpu.ops import pallas_band as pb


def _pack(seqs, pad):
    arr = np.zeros((len(seqs), pad), dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, :len(s)] = np.frombuffer(s.encode("latin1"), dtype=np.uint8)
        lens[i] = len(s)
    return arr, lens


def _ont_like_pairs(seed, count, minlen=150, maxlen=300, err=0.02):
    """Near-diagonal pairs: substitutions + sparse indels, like chained ONT
    regions - the case the band is built for."""
    rng = random.Random(seed)
    pairs = []
    for _ in range(count):
        n = rng.randrange(minlen, maxlen)
        base = "".join(rng.choice("ACGT") for _ in range(n))
        mut = list(base)
        for _ in range(int(n * err)):
            p = rng.randrange(len(mut))
            op = rng.random()
            if op < 0.6:
                mut[p] = rng.choice("ACGT")
            elif op < 0.8:
                mut.insert(p, rng.choice("ACGT"))
            else:
                del mut[p]
        pairs.append((base, "".join(mut)))
    return pairs


@pytest.mark.parametrize("params", [(1, -1, -1), (2, -1, -2)])
def test_certified_scores_exact(params):
    match, mismatch, gap = params
    pairs = _ont_like_pairs(11 + match, 8)
    pairs += [("A", "A"), ("AC-GT", "ACGT"), ("ACGT" * 8, "ACGT" * 8)]
    qa, ql = _pack([p[0] for p in pairs], max(len(p[0]) for p in pairs))
    ta, tl = _pack([p[1] for p in pairs], max(len(p[1]) for p in pairs))

    want = al.align_batch(qa, ql, ta, tl, 0, match, mismatch, gap)
    got = pb.align_scores_banded(qa, ql, ta, tl, match, mismatch, gap,
                                 band=128, block=8, interpret=True)
    cert = np.asarray(pb.certify(got.score, qa, ql, ta, tl,
                                 jnp.int32(match), jnp.int32(mismatch),
                                 jnp.int32(gap), 128))
    # ONT-like pairs at 2% error are comfortably certifiable at band 128.
    assert cert[:8].all() and cert[8:].all()
    np.testing.assert_array_equal(np.asarray(got.score)[cert],
                                  np.asarray(want.score)[cert])


def test_certificate_rejects_out_of_band():
    # 300-base deletion in the middle: optimal path leaves a 128-band.
    rng = random.Random(3)
    base = "".join(rng.choice("ACGT") for _ in range(700))
    mut = base[:200] + base[500:]
    qa, ql = _pack([base], 700)
    ta, tl = _pack([mut], 700)
    got = pb.align_scores_banded(qa, ql, ta, tl, 1, -1, -1,
                                 band=128, block=8, interpret=True)
    cert = np.asarray(pb.certify(got.score, qa, ql, ta, tl,
                                 jnp.int32(1), jnp.int32(-1), jnp.int32(-1),
                                 128))
    want = al.align_batch(qa, ql, ta, tl, 0, 1, -1, -1)
    # The true optimum needs |o|=300 > band; either the certificate refuses,
    # or (tiny matrices fully covered) it matches - here it must refuse
    # unless it happens to agree.
    if cert[0]:
        np.testing.assert_array_equal(np.asarray(got.score),
                                      np.asarray(want.score))
    else:
        assert np.asarray(got.score)[0] <= np.asarray(want.score)[0]


def test_dash_blocks_certificate():
    # '-' makes gaps free (team_alignment.cpp:25-28): the score bound is
    # invalid, so certify() must refuse (except whole-matrix coverage).
    q = "ACGT" + "-" * 200 + "ACGT" * 40
    t = "ACGT" * 41
    qa, ql = _pack([q], len(q))
    ta, tl = _pack([t], 256)
    got = pb.align_scores_banded(qa, ql, ta, tl, 1, -1, -1,
                                 band=128, block=8, interpret=True)
    cert = np.asarray(pb.certify(got.score, qa, ql, ta, tl,
                                 jnp.int32(1), jnp.int32(-1), jnp.int32(-1),
                                 128))
    whole = (ql[0] <= 128) & (tl[0] <= 126)
    assert whole or not cert[0]


def test_map_step_banded_exact_with_fallback():
    """Fused step with band on == band off, even when reads need fallback."""
    from bioinfo1_tpu.index import builder
    from bioinfo1_tpu.pipeline import device_map as dm

    rng = np.random.default_rng(5)
    k, w = 15, 5
    genome = "".join("CATG"[i] for i in rng.integers(0, 4, 8192))
    index = builder.build_index(genome, k, w, 0.001)
    didx = dm.device_index_from_host(index)

    L = 512
    gbytes = np.frombuffer(genome.encode(), dtype=np.uint8)
    reads = np.zeros((8, L), dtype=np.uint8)
    lens = np.full((8,), L, dtype=np.int32)
    for b in range(8):
        start = int(rng.integers(0, len(genome) - L))
        r = gbytes[start:start + L].copy()
        if b >= 6:
            # Large internal deletion: region needs the full kernel.
            r = np.concatenate([r[:100], r[400:], gbytes[:300]])[:L]
        reads[b] = r
    args = (jnp.asarray(reads), jnp.asarray(lens), didx,
            jnp.int32(1), jnp.int32(-1), jnp.int32(-1))
    kw = dict(k=k, w=w, mode=0, budget=512, region_cap=2 * L)
    out_full = dm.map_step(*args, **kw, band=0)
    out_band = dm.map_step(*args, **kw, band=128)
    np.testing.assert_array_equal(np.asarray(out_full.mapped),
                                  np.asarray(out_band.mapped))
    np.testing.assert_array_equal(np.asarray(out_full.score),
                                  np.asarray(out_band.score))
    np.testing.assert_array_equal(np.asarray(out_full.t_begin),
                                  np.asarray(out_band.t_begin))


def test_banded_parents_cigar_exact():
    """align_banded_parents + strict certificate -> byte-identical CIGARs."""
    from bioinfo1_tpu.utils import cigar as cg

    pairs = _ont_like_pairs(21, 10, minlen=400, maxlen=700)
    qs = [p[0] for p in pairs]
    ts = [p[1] for p in pairs]
    qa, ql = _pack(qs, max(len(s) for s in qs))
    ta, tl = _pack(ts, max(len(s) for s in ts))
    band = 128

    full = al.align_batch(qa, ql, ta, tl, 0, 1, -1, -1, want_parents=True)
    got = al.align_banded_parents(qa, ql, ta, tl, 1, -1, -1, band=band)
    cert = np.asarray(pb.certify(got.score, qa, ql, ta, tl,
                                 jnp.int32(1), jnp.int32(-1), jnp.int32(-1),
                                 band, strict=True, lane_multiple=16))
    assert cert.all()
    np.testing.assert_array_equal(np.asarray(got.score),
                                  np.asarray(full.score))
    fp = np.asarray(full.parents)
    bp = np.asarray(got.parents)
    for b in range(len(pairs)):
        want_cig, _ = cg.traceback(fp[:, b, :], qs[b], ts[b],
                                   len(qs[b]), len(ts[b]), "global",
                                   int(full.score[b]), 1, -1, -1)
        got_cig, _ = cg.traceback(bp[:, b, :], qs[b], ts[b],
                                  len(qs[b]), len(ts[b]), "global",
                                  int(got.score[b]), 1, -1, -1, band=band)
        assert want_cig == got_cig, (b, want_cig, got_cig)


@pytest.mark.parametrize("mode,name", [(1, "local"), (2, "semiGlobal")])
def test_banded_local_semiglobal_exact(mode, name):
    """Banded local/semiGlobal (r03): certified scores, goal cells and
    CIGARs must equal the full DP / executable spec byte-for-byte, in both
    the lax and Pallas kernels."""
    from bioinfo1_tpu.utils import cigar as cg
    from bioinfo1_tpu import reference_model as rm

    pairs = _ont_like_pairs(41 + mode, 8, minlen=200, maxlen=400, err=0.05)
    qs = [p[0] for p in pairs]
    ts = [p[1] for p in pairs]
    qa, ql = _pack(qs, max(len(s) for s in qs))
    ta, tl = _pack(ts, max(len(s) for s in ts))
    band = 128

    full = al.align_batch(qa, ql, ta, tl, mode, 1, -1, -1,
                          want_parents=True)
    for kernel in ("lax", "pallas"):
        if kernel == "lax":
            got = al.align_banded_parents(qa, ql, ta, tl, 1, -1, -1,
                                          band=band, mode=mode)
            W, lm = band, 16
        else:
            got = pb.align_scores_banded(qa, ql, ta, tl, 1, -1, -1,
                                         band=band, block=8, interpret=True,
                                         want_parents=True, mode=mode)
            W, lm = 128, 128
        cert = np.asarray(pb.certify(got.score, qa, ql, ta, tl,
                                     jnp.int32(1), jnp.int32(-1),
                                     jnp.int32(-1), band, strict=True,
                                     lane_multiple=lm, mode=mode))
        assert cert.all(), (kernel, cert)
        np.testing.assert_array_equal(np.asarray(got.score),
                                      np.asarray(full.score), kernel)
        np.testing.assert_array_equal(np.asarray(got.goal_i),
                                      np.asarray(full.goal_i), kernel)
        np.testing.assert_array_equal(np.asarray(got.goal_j),
                                      np.asarray(full.goal_j), kernel)
        gp = np.asarray(got.parents)
        for b in range(len(pairs)):
            want = rm.align(qs[b], ts[b], name, 1, -1, -1, want_cigar=True)
            got_cig, tb = cg.traceback(gp[:, b, :], qs[b], ts[b],
                                       int(got.goal_i[b]),
                                       int(got.goal_j[b]), name,
                                       int(got.score[b]), 1, -1, -1, band=W)
            assert got.score[b] == want.score, (kernel, b)
            assert got_cig == want.cigar, (kernel, b, got_cig, want.cigar)
            if name == "local":
                assert tb == want.target_begin, (kernel, b)


def test_banded_local_certificate_rejects_far_repeat():
    """A local pair whose best alignment lies far off-diagonal (long target
    prefix before the match) must NOT be certified at a narrow band."""
    rng = random.Random(9)
    core = "".join(rng.choice("ACGT") for _ in range(150))
    q = core
    t = "".join(rng.choice("ACGT") for _ in range(400)) + core
    qa, ql = _pack([q], len(q))
    ta, tl = _pack([t], len(t))
    got = al.align_banded_parents(qa, ql, ta, tl, 1, -1, -1, band=64,
                                  mode=1)
    cert = np.asarray(pb.certify(got.score, qa, ql, ta, tl,
                                 jnp.int32(1), jnp.int32(-1), jnp.int32(-1),
                                 64, strict=True, lane_multiple=16, mode=1))
    full = al.align_batch(qa, ql, ta, tl, 1, 1, -1, -1)
    # The true local optimum (150 matches at offset ~400) is invisible to a
    # 64-band; the certificate must refuse rather than certify a lie.
    assert int(full.score[0]) == 150
    assert int(got.score[0]) < 150
    assert not cert[0]


def test_pallas_banded_parents_match_lax():
    """Pallas want_parents kernel == lax align_banded_parents.

    Scores must be bit-equal; parents are compared through the traceback
    walk (raw arrays differ only at out-of-matrix lanes, where the two
    wrappers pad the query stream differently).
    """
    from bioinfo1_tpu.utils import cigar as cg

    pairs = _ont_like_pairs(33, 6, minlen=200, maxlen=400)
    qs = [p[0] for p in pairs]
    ts = [p[1] for p in pairs]
    qa, ql = _pack(qs, max(len(s) for s in qs))
    ta, tl = _pack(ts, max(len(s) for s in ts))
    lax_o = al.align_banded_parents(qa, ql, ta, tl, 1, -1, -1, band=128)
    pal_o = pb.align_scores_banded(qa, ql, ta, tl, 1, -1, -1, band=128,
                                   block=8, interpret=True,
                                   want_parents=True)
    np.testing.assert_array_equal(np.asarray(lax_o.score),
                                  np.asarray(pal_o.score))
    lp = np.asarray(lax_o.parents)
    pp = np.asarray(pal_o.parents)
    for b in range(len(pairs)):
        c1, _ = cg.traceback(lp[:, b, :], qs[b], ts[b], len(qs[b]),
                             len(ts[b]), "global", int(lax_o.score[b]),
                             1, -1, -1, band=128)
        c2, _ = cg.traceback(pp[:, b, :], qs[b], ts[b], len(qs[b]),
                             len(ts[b]), "global", int(pal_o.score[b]),
                             1, -1, -1, band=128)
        assert c1 == c2, (b, c1, c2)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_dash_free_specialization_identical(mode):
    """dash_free=True (static kernel specialization dropping the literal-'-'
    free-gap compares, team_alignment.cpp:25-28) is bit-identical to the
    general kernel on dash-free inputs: scores, goal cells AND the packed
    parent stream."""
    pairs = _ont_like_pairs(99, 8)
    qa, ql = _pack([p[0] for p in pairs], max(len(p[0]) for p in pairs))
    ta, tl = _pack([p[1] for p in pairs], max(len(p[1]) for p in pairs))
    kw = dict(band=128, block=8, interpret=True, want_parents=True,
              mode=mode)
    gen = pb.align_scores_banded(qa, ql, ta, tl, 2, -1, -2, **kw)
    fast = pb.align_scores_banded(qa, ql, ta, tl, 2, -1, -2,
                                  dash_free=True, **kw)
    np.testing.assert_array_equal(np.asarray(gen.score),
                                  np.asarray(fast.score))
    np.testing.assert_array_equal(np.asarray(gen.goal_i),
                                  np.asarray(fast.goal_i))
    np.testing.assert_array_equal(np.asarray(gen.goal_j),
                                  np.asarray(fast.goal_j))
    np.testing.assert_array_equal(np.asarray(gen.parents),
                                  np.asarray(fast.parents))


def test_dash_inputs_route_to_general_kernel():
    """The mapper's host-side scans must keep dash inputs OFF the
    specialized kernel: with a literal '-' the two kernels genuinely
    differ (free gap vs charged gap), which is what the scans protect."""
    qa, ql = _pack(["AC-GT"], 8)
    ta, tl = _pack(["ACGT"], 8)
    gen = pb.align_scores_banded(qa, ql, ta, tl, 1, -1, -1,
                                 band=128, block=8, interpret=True)
    fast = pb.align_scores_banded(qa, ql, ta, tl, 1, -1, -1,
                                  band=128, block=8, interpret=True,
                                  dash_free=True)
    # '-' aligned as a free deletion under the general rule.
    assert int(gen.score[0]) > int(fast.score[0])


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_pair_loop_tiny_length_grid(mode):
    """Exhaustive tiny-length grid for the 2-diagonals-per-iteration loop:
    every (ql, tl) parity combination, goals on the very first diagonals,
    and d_stop/d_border interactions far below W+2.  Band >= matrix, so
    certify's `whole` term holds and banded must equal the full DP."""
    rng = random.Random(3)
    pairs = [("".join(rng.choice("ACGT") for _ in range(a)),
              "".join(rng.choice("ACGT") for _ in range(b)))
             for a in range(1, 7) for b in range(1, 7)]
    qa, ql = _pack([p[0] for p in pairs], 8)
    ta, tl = _pack([p[1] for p in pairs], 8)
    want = al.align_batch(qa, ql, ta, tl, mode, 2, -1, -2)
    got = pb.align_scores_banded(qa, ql, ta, tl, 2, -1, -2,
                                 band=128, block=8, interpret=True,
                                 mode=mode, dash_free=True)
    np.testing.assert_array_equal(np.asarray(got.score),
                                  np.asarray(want.score))
    if mode != 0:
        np.testing.assert_array_equal(np.asarray(got.goal_i),
                                      np.asarray(want.goal_i))
        np.testing.assert_array_equal(np.asarray(got.goal_j),
                                      np.asarray(want.goal_j))
