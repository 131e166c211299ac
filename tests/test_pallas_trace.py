"""Pallas per-diagonal traceback walk vs the lockstep XLA walk.

The Pallas walk emits diagonal-indexed codes with interleaved skips
(code 3); after skip-filtering, the op sequence must equal the XLA walk's
for every read, and both decoders (numpy spec + native) must agree.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bioinfo1_tpu.ops import pallas_band as pb
from bioinfo1_tpu.ops import trace as tr
from bioinfo1_tpu.ops.trace import unpack_codes_np
from bioinfo1_tpu.utils import cigar as cg

_BASES = np.frombuffer(b"CATG", np.uint8)


def _indel_pairs(rng, B, n):
    q = np.zeros((B, n), np.uint8)
    t = np.zeros((B, 2 * n), np.uint8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for b in range(B):
        L = int(rng.integers(n // 2, n))
        s = _BASES[rng.integers(0, 4, L)]
        tt = list(s.copy())
        for _ in range(L // 12):
            pos = int(rng.integers(0, max(len(tt), 1)))
            op = rng.integers(0, 3)
            if op == 0 and tt:
                tt[pos] = _BASES[rng.integers(0, 4)]
            elif op == 1 and len(tt) > 4:
                del tt[pos]
            else:
                tt.insert(pos, _BASES[rng.integers(0, 4)])
        tt = np.array(tt, np.uint8)
        q[b, :L] = s
        ql[b] = L
        t[b, :len(tt)] = tt
        tl[b] = len(tt)
    return (jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
            jnp.asarray(tl))


def test_pallas_walk_matches_xla_walk():
    rng = np.random.default_rng(1)
    B, n, W = 8, 384, 128
    for mode in (0, 2):
        q, ql, t, tl = _indel_pairs(rng, B, n)
        out = pb.align_scores_banded(
            q, ql, t, tl, jnp.int32(1), jnp.int32(-1), jnp.int32(-1),
            band=W, want_parents=True, mode=mode, interpret=True)
        codes_x = jax.device_get(tr.pack_codes(tr.walk_parents(
            out.parents, out.goal_i, out.goal_j, out.score,
            q, t, 1, -1, -1, mode=mode, band=W)))
        codes_p = jax.device_get(tr.walk_parents_pallas(
            out.parents, out.goal_i, out.goal_j, band=W, interpret=True))
        ux = unpack_codes_np(codes_x)
        up = unpack_codes_np(codes_p)
        gi = jax.device_get(out.goal_i)
        gj = jax.device_get(out.goal_j)
        qln = jax.device_get(ql)
        tln = jax.device_get(tl)
        mname = {0: "global", 2: "semiGlobal"}[mode]
        for b in range(B):
            # raw op sequences equal after skip filtering
            np.testing.assert_array_equal(
                ux[:, b][ux[:, b] != 255], up[:, b][up[:, b] != 255],
                err_msg=f"mode={mname} read={b}")
            # decoded CIGARs equal through the numpy spec decoder
            cx, tx = cg.cigar_from_codes(
                ux[:, b], mname, int(gi[b]), int(gj[b]),
                int(qln[b]), int(tln[b]))
            cp, tp = cg.cigar_from_codes(
                up[:, b], mname, int(gi[b]), int(gj[b]),
                int(qln[b]), int(tln[b]))
            assert (cx, tx) == (cp, tp), (mname, b)


def test_native_decoder_skips_mid_stream_threes():
    """The d-indexed stream interleaves 3s; the native decoder must agree
    with the numpy spec decoder on it."""
    from bioinfo1_tpu import native
    rng = np.random.default_rng(2)
    B, n, W = 6, 256, 128
    q, ql, t, tl = _indel_pairs(rng, B, n)
    out = pb.align_scores_banded(
        q, ql, t, tl, jnp.int32(1), jnp.int32(-1), jnp.int32(-1),
        band=W, want_parents=True, mode=0, interpret=True)
    packed = jax.device_get(tr.walk_parents_pallas(
        out.parents, out.goal_i, out.goal_j, band=W, interpret=True))
    gi = jax.device_get(out.goal_i)
    gj = jax.device_get(out.goal_j)
    qln = jax.device_get(ql)
    tln = jax.device_get(tl)
    idxs = np.arange(B, dtype=np.int32)
    nat = native.cigar_rle_batch(packed, idxs, gi, gj, qln, tln, "global",
                                 sam_convention=False,
                                 local_target_begin_end=False)
    if nat is None:
        import pytest
        pytest.skip("native library not built")
    cigs, tbs = nat
    codes = unpack_codes_np(packed)
    for b in range(B):
        want, _ = cg.cigar_from_codes(codes[:, b], "global", int(gi[b]),
                                      int(gj[b]), int(qln[b]), int(tln[b]))
        assert cigs[b] == want, b
