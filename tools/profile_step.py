#!/usr/bin/env python
"""Dev tool: profile the fused map step on the bench workload (real TPU).

Caches the built host index in build/bench_host_index.npz so repeated
profiling runs skip the index build.  Not part of the shipped CLI.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

import bench                                  # noqa: E402
from bioinfo1_tpu.index import builder        # noqa: E402
from bioinfo1_tpu import reference_model as rm  # noqa: E402
from bioinfo1_tpu.pipeline import device_map as dm  # noqa: E402

CACHE = os.path.join(REPO, "build", "bench_host_index.npz")


def bench_index(genome_str):
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        fwd = builder.StrandIndexArrays(
            hash_sorted=z["fwd_hash"], pos_sorted=z["fwd_pos"],
            n_unique_tuples=0, n_distinct_hashes=0, n_singleton_hashes=0,
            banned=np.zeros(0, np.uint32), max_bucket=0, top_surviving=None)
        rev = builder.StrandIndexArrays(
            hash_sorted=z["rev_hash"], pos_sorted=z["rev_pos"],
            n_unique_tuples=0, n_distinct_hashes=0, n_singleton_hashes=0,
            banned=np.zeros(0, np.uint32), max_bucket=0, top_surviving=None)
        return builder.IndexArrays(
            fwd=fwd, rev=rev, ref_len=len(genome_str), k=15, w=5,
            ref_fwd_seq=genome_str,
            ref_rev_seq=rm.reverse_complement(genome_str))
    t0 = time.time()
    index = builder.build_index(genome_str, 15, 5, 0.001)
    print("index build", round(time.time() - t0, 1), "s")
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    np.savez(CACHE, fwd_hash=index.fwd.hash_sorted,
             fwd_pos=index.fwd.pos_sorted,
             rev_hash=index.rev.hash_sorted, rev_pos=index.rev.pos_sorted)
    return index


def main():
    genome, reads, lens = bench.make_data()
    genome_str = genome.tobytes().decode("latin1")
    index = bench_index(genome_str)
    didx = dm.device_index_from_host(index)
    jax.block_until_ready(didx.ref_bytes)
    print("backend", jax.default_backend(),
          "| combined table", didx.key_hash.shape,
          "steps", didx.bsearch_steps)

    reads_d = jax.device_put(reads)
    lens_d = jax.device_put(lens)
    jax.block_until_ready(reads_d)
    m, n, g = jnp.int32(1), jnp.int32(-1), jnp.int32(-1)

    for batch in (64, 256):
        for band in (0, 128, 256):
            for budget in (2048,):
                def run(i):
                    rb = jax.lax.dynamic_slice_in_dim(reads_d, i, batch, 0)
                    lb = jax.lax.dynamic_slice_in_dim(lens_d, i, batch, 0)
                    o = dm.map_step(
                        rb, lb, didx, m, n, g, k=15, w=5, mode=0,
                        budget=budget, region_cap=8192,
                        use_pallas=True, band=band)
                    return (jnp.sum(o.mapped), jnp.sum(o.overflow),
                            jnp.sum(o.score))
                # block_until_ready can return early on the axon tunnel:
                # timed regions must end in a device_get over all batches.
                t0 = time.time()
                jax.device_get(run(0)[2])
                tc = time.time() - t0
                t0 = time.time()
                acc = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
                for i in range(0, 256, batch):
                    o = run(i)
                    acc = tuple(a + b for a, b in zip(acc, o))
                mapped, over, _ = jax.device_get(acc)
                dt = time.time() - t0
                print(f"batch={batch} band={band} budget={budget}: "
                      f"{256 / dt:8.1f} reads/s  mapped={int(mapped)} "
                      f"overflow={int(over)} compile={tc:.1f}s")


if __name__ == "__main__":
    main()
