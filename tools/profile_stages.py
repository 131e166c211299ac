#!/usr/bin/env python
"""Dev tool: cumulative stage decomposition of the fused map step."""

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

B, K, W = 256, 15, 5
BUDGET = 2048
CAP = 8192


def main():
    genome, reads, lens = bench.make_data()
    index = bench_index(genome.tobytes().decode("latin1"))
    didx = dm.device_index_from_host(index)
    jax.block_until_ready(didx.ref_bytes)
    print("steps:", didx.bsearch_steps)
    reads_d = jax.device_put(reads[:B])
    lens_d = jax.device_put(lens[:B])
    jax.block_until_ready(reads_d)
    m, n, g = jnp.int32(1), jnp.int32(-1), jnp.int32(-1)

    def upto(stage):
        # didx is passed as a pytree ARG, not closed over: a closure would
        # embed the multi-GB index as captured constants at lowering.
        @jax.jit
        def f(r, l, dx):
            mres = mz.minimize_batch(r, l, K, W)
            if stage == "minimize":
                return jnp.sum(mres.hashes) + jnp.sum(mres.dedup_keep)
            q_hash, q_pos, q_keep, q_over = match_ops.compact_queries(
                mres.hashes, mres.pos, mres.dedup_keep,
                min(mres.hashes.shape[1], BUDGET))
            if stage == "compact":
                return jnp.sum(q_hash) + jnp.sum(q_keep)
            got_f, got_r = match_ops.find_matches_combined(
                q_hash, q_pos, q_keep, dx.key_hash, dx.key_pos,
                dx.cnt_fr, dx.cnt_r2, dx.bucket_off, dx.shift,
                dx.bsearch_steps, BUDGET, dx.cnt_shift)
            if stage == "match":
                return (jnp.sum(got_f.r_pos) + jnp.sum(got_r.r_pos)
                        + jnp.sum(got_f.count) + jnp.sum(got_r.count))
            from bioinfo1_tpu.ops import pallas_chain
            both = pallas_chain.lis_chain_sorted(
                jnp.concatenate([got_f.f_pos, got_r.f_pos], axis=0),
                jnp.concatenate([got_f.r_pos, got_r.r_pos], axis=0),
                jnp.concatenate([got_f.count, got_r.count], axis=0))
            if stage == "chain":
                return jnp.sum(both.length) + jnp.sum(both.q_start)
            return jnp.sum(both.length)

        return lambda r, l: f(r, l, didx)

    def full(r, l, dx):
        # dx as an ARG, not a closure: closing over the index embeds the
        # multi-GB tables as captured constants at lowering (the remote
        # compiler rejects the oversized program).
        o = dm.map_step(r, l, dx, m, n, g, k=K, w=W, mode=0,
                        budget=BUDGET, region_cap=CAP,
                        use_pallas=True, band=128)
        return o.score.sum() + o.mapped.sum()

    full_jit = jax.jit(full)
    full_j = lambda r, l: full_jit(r, l, didx)   # noqa: E731

    def timed(name, fn, nrep=4):
        jax.device_get(fn(reads_d, lens_d))
        best = 1e9
        for _ in range(nrep):
            t0 = time.time()
            jax.device_get(fn(reads_d, lens_d))
            best = min(best, time.time() - t0)
        print(f"{name:12s} {best*1e3:8.1f} ms", flush=True)

    for st in ("minimize", "compact", "match", "chain"):
        timed(st, upto(st))
    timed("full", full_j)


if __name__ == "__main__":
    main()
