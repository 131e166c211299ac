"""Pallas LIS kernel vs the lax implementation (interpreter mode on CPU)."""

import random

import jax
import numpy as np

from bioinfo1_tpu.ops import chain as chain_ops
from bioinfo1_tpu.ops import pallas_chain as pc


def _random_matches(seed, B, N):
    rng = random.Random(seed)
    f = np.zeros((B, N), np.int32)
    r = np.zeros((B, N), np.int32)
    cnt = np.zeros((B,), np.int32)
    for b in range(B):
        n = rng.randrange(0, N + 1)
        cnt[b] = n
        fp, rp = 1, 1
        for j in range(n):
            # Mix of ascending runs (chains) and random jumps, with some
            # gaps beyond the 5000 cap.
            if rng.random() < 0.7:
                fp += rng.randrange(1, 30)
                rp += rng.randrange(1, 30)
            else:
                fp = rng.randrange(1, 20000)
                rp = rng.randrange(1, 20000)
            f[b, j], r[b, j] = fp, rp
    return f, r, cnt


def test_pallas_chain_matches_lax():
    f, r, cnt = _random_matches(11, B=12, N=96)
    want = chain_ops.lis_chain(f, r, cnt)
    got = pc.lis_chain(f, r, cnt, interpret=True)
    for field in ("length", "q_start", "q_end", "t_start", "t_end"):
        w = jax.device_get(getattr(want, field))
        g = jax.device_get(getattr(got, field))
        # Rows with length 0 have unspecified endpoints; compare only the
        # length there.
        has = jax.device_get(want.length) > 0
        if field == "length":
            np.testing.assert_array_equal(g, w)
        else:
            np.testing.assert_array_equal(g[has], w[has], err_msg=field)


def test_pallas_chain_direct_cases():
    cases = [
        [(10, 5), (5, 8)],
        [(5, 5), (10, 8)],
        [(5, 5), (10, 6000)],
        [(1, 1), (2, 2), (3, 3), (2, 4), (4, 4)],
        [(7, 3)],
        [],
    ]
    N = 8
    B = len(cases)
    f = np.zeros((B, N), np.int32)
    r = np.zeros((B, N), np.int32)
    cnt = np.zeros((B,), np.int32)
    for i, c in enumerate(cases):
        for j, (ff, rr) in enumerate(c):
            f[i, j], r[i, j] = ff, rr
        cnt[i] = len(c)
    want = chain_ops.lis_chain(f, r, cnt)
    got = pc.lis_chain(f, r, cnt, interpret=True)
    np.testing.assert_array_equal(jax.device_get(got.length),
                                  jax.device_get(want.length))
    has = jax.device_get(want.length) > 0
    for field in ("q_start", "q_end", "t_start", "t_end"):
        np.testing.assert_array_equal(
            jax.device_get(getattr(got, field))[has],
            jax.device_get(getattr(want, field))[has])


def test_pallas_chain_sorted_matches_lax():
    """lis_chain_sorted: count-sorted tiling must not change any output."""
    f, r, cnt = _random_matches(23, B=17, N=96)
    want = chain_ops.lis_chain(f, r, cnt)
    got = pc.lis_chain_sorted(f, r, cnt, interpret=True)
    has = jax.device_get(want.length) > 0
    for field in ("length", "q_start", "q_end", "t_start", "t_end"):
        w = jax.device_get(getattr(want, field))
        g = jax.device_get(getattr(got, field))
        if field == "length":
            np.testing.assert_array_equal(g, w)
        else:
            np.testing.assert_array_equal(g[has], w[has], err_msg=field)


def test_pallas_chain_multi_chunk_repeat():
    """Multi-chunk coverage of the r05 chunked DP: > C=256 matches per row
    with repeat-copy structure (window-straddling r offsets), so the
    cross-chunk phase, the expiry skip, and the chunked backtrack all run."""
    rng = np.random.default_rng(5)
    B, N = 6, 700                                  # 3 chunks (C=256)
    f = np.zeros((B, N), np.int32)
    r = np.zeros((B, N), np.int32)
    cnt = np.zeros((B,), np.int32)
    for i in range(B):
        n = int(rng.integers(N // 2, N + 1))
        cnt[i] = n
        fs = np.sort(rng.integers(1, 12000, n)).astype(np.int32)
        copies = rng.integers(0, 7, n).astype(np.int32)
        f[i, :n] = fs
        r[i, :n] = fs + copies * 5300 + rng.integers(-80, 80, n)
    want = chain_ops.lis_chain(f, r, cnt)
    got = pc.lis_chain(f, r, cnt, interpret=True)
    has = jax.device_get(want.length) > 0
    assert has.any()
    for field in ("length", "q_start", "q_end", "t_start", "t_end"):
        w = jax.device_get(getattr(want, field))
        g = jax.device_get(getattr(got, field))
        if field == "length":
            np.testing.assert_array_equal(g, w)
        else:
            np.testing.assert_array_equal(g[has], w[has], err_msg=field)
