#!/usr/bin/env python
"""Dev tool: decompose the seed-match stage cost on the bench workload.

Times each sub-piece of the match pipeline in isolation (jitted, scalar
reduction fetched so the tunnel can't lie):

  minimize -> compact_queries -> [bsearch rounds | count gather | _compact]

Not part of the shipped CLI.
"""

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

import bench                                  # noqa: E402
from bioinfo1_tpu.ops import match as match_ops  # noqa: E402
from bioinfo1_tpu.ops import minimizer as mz  # noqa: E402
from bioinfo1_tpu.pipeline import device_map as dm  # noqa: E402
from tools.profile_step import bench_index    # noqa: E402

B = 256
BUDGET = 2048
K, W = 15, 5


def timed(name, fn, *args, n=5):
    fn(*args)  # compile
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        r = jax.device_get(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name:36s} {best * 1e3:8.2f} ms")
    return best


def main():
    genome, reads, lens = bench.make_data()
    genome_str = genome.tobytes().decode("latin1")
    index = bench_index(genome_str)
    didx = dm.device_index_from_host(index)
    jax.block_until_ready(didx.ref_bytes)
    print("backend", jax.default_backend(), "| U =", didx.key_hash.shape[0],
          "| steps =", didx.bsearch_steps, "| shift =", didx.shift)

    reads_d = jax.device_put(reads[:B])
    lens_d = jax.device_put(lens[:B])
    jax.block_until_ready(reads_d)

    @jax.jit
    def f_minimize(r, l):
        m = mz.minimize_batch(r, l, K, W)
        return jnp.sum(m.hashes) + jnp.sum(m.pos)

    @jax.jit
    def f_min_compact(r, l):
        m = mz.minimize_batch(r, l, K, W)
        h, p, k2, ov = match_ops.compact_queries(
            m.hashes, m.pos, m.dedup_keep, BUDGET)
        return jnp.sum(h) + jnp.sum(p) + jnp.sum(k2)

    # Precompute compacted queries once; time downstream pieces from there.
    @jax.jit
    def queries(r, l):
        m = mz.minimize_batch(r, l, K, W)
        return match_ops.compact_queries(m.hashes, m.pos, m.dedup_keep,
                                         BUDGET)

    q_hash, q_pos, q_keep, _ = queries(reads_d, lens_d)
    q_hash, q_pos, q_keep = map(jax.block_until_ready,
                                (q_hash, q_pos, q_keep))

    steps = didx.bsearch_steps
    shift = didx.shift

    @jax.jit
    def f_bsearch(qh, kh, bo):
        U = kh.shape[0]
        q = qh.astype(jnp.uint32)
        b = jax.lax.shift_right_logical(
            q, jnp.uint32(shift)).astype(jnp.int32)
        lo = jnp.take(bo, b)
        hi = jnp.take(bo, b + 1)
        for _ in range(steps):
            mid = (lo + hi) // 2
            v = jnp.take(kh, jnp.clip(mid, 0, U - 1))
            go = v < q
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return jnp.sum(lo)

    @jax.jit
    def f_bsearch_cnt(qh, qk, kh, cfr, bo):
        U = kh.shape[0]
        q = qh.astype(jnp.uint32)
        b = jax.lax.shift_right_logical(
            q, jnp.uint32(shift)).astype(jnp.int32)
        lo = jnp.take(bo, b)
        hi = jnp.take(bo, b + 1)
        for _ in range(steps):
            mid = (lo + hi) // 2
            v = jnp.take(kh, jnp.clip(mid, 0, U - 1))
            go = v < q
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        loc = jnp.clip(lo, 0, U - 1)
        present = (jnp.take(kh, loc) == q) & qk
        both = jnp.where(present, jnp.take(cfr, loc), jnp.uint32(0))
        cf = (both & jnp.uint32(0xFFFF)).astype(jnp.int32)
        cr = jax.lax.shift_right_logical(
            both, jnp.uint32(16)).astype(jnp.int32)
        return jnp.sum(lo) + jnp.sum(cf) + jnp.sum(cr)

    @jax.jit
    def f_full_match(qh, qp, qk):
        mf, mr = match_ops.find_matches_combined(
            qh, qp, qk, didx.key_hash, didx.key_pos, didx.cnt_fr,
            didx.cnt_r2, didx.bucket_off, shift, steps, BUDGET,
            didx.cnt_shift)
        return (jnp.sum(mf.r_pos) + jnp.sum(mr.r_pos)
                + jnp.sum(mf.count) + jnp.sum(mr.count))

    # _compact alone: feed it realistic cnt/start from the real search.
    @jax.jit
    def lo_cnt(qh, qk):
        U = didx.key_hash.shape[0]
        q = qh.astype(jnp.uint32)
        b = jax.lax.shift_right_logical(
            q, jnp.uint32(shift)).astype(jnp.int32)
        lo = jnp.take(didx.bucket_off, b)
        hi = jnp.take(didx.bucket_off, b + 1)
        for _ in range(steps):
            mid = (lo + hi) // 2
            v = jnp.take(didx.key_hash, jnp.clip(mid, 0, U - 1))
            go = v < q
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        loc = jnp.clip(lo, 0, U - 1)
        present = (jnp.take(didx.key_hash, loc) == q) & qk
        both = jnp.where(present, jnp.take(didx.cnt_fr, loc), jnp.uint32(0))
        cf = (both & jnp.uint32(0xFFFF)).astype(jnp.int32)
        return lo, cf

    lo_v, cf_v = map(jax.block_until_ready, lo_cnt(q_hash, q_keep))

    @jax.jit
    def f_compact_only(cnt, start, qp):
        m = match_ops._compact(cnt, start, qp, didx.key_pos, BUDGET)
        return jnp.sum(m.r_pos) + jnp.sum(m.count)

    timed("minimize", f_minimize, reads_d, lens_d)
    timed("minimize+compact_queries", f_min_compact, reads_d, lens_d)
    timed("bsearch only", f_bsearch, q_hash, didx.key_hash, didx.bucket_off)
    timed("bsearch+count gather", f_bsearch_cnt, q_hash, q_keep,
          didx.key_hash, didx.cnt_fr, didx.bucket_off)
    timed("_compact only (fwd)", f_compact_only, cf_v, lo_v, q_pos)
    timed("find_matches_combined (both)", f_full_match,
          q_hash, q_pos, q_keep)


if __name__ == "__main__":
    main()
