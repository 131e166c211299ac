#!/usr/bin/env python
"""Dev tool: marginal cost of dedup mask + compact_queries (the suspects)."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

from bioinfo1_tpu.ops import match as match_ops  # noqa: E402
from bioinfo1_tpu.ops import minimizer as mz  # noqa: E402

B, L = 256, 4096
K, W = 15, 5
R = 4


def timed(name, fn, *args, n=4):
    fn(*args)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        jax.device_get(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name:46s} {best * 1e3:8.2f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"CATG", dtype=np.uint8)
    reads = jax.device_put(bases[rng.integers(0, 4, (B, L))])
    lens = jax.device_put(np.full((B,), L, np.int32))

    @jax.jit
    def f_base(r):
        return jnp.sum(r)

    @jax.jit
    def f_sweep_only(r, l):
        acc = jnp.uint32(0)
        for i in range(R):
            m = mz.minimize_batch(r + (i % 2), l, K, W)
            acc += jnp.sum(m.hashes) + jnp.sum(m.pos).astype(jnp.uint32)
        return acc            # dedup_keep unused -> DCE'd

    @jax.jit
    def f_sweep_dedup(r, l):
        acc = jnp.uint32(0)
        for i in range(R):
            m = mz.minimize_batch(r + (i % 2), l, K, W)
            acc += jnp.sum(m.hashes) + jnp.sum(m.dedup_keep)
        return acc

    @jax.jit
    def f_sweep_dedup_compact(r, l):
        acc = jnp.uint32(0)
        for i in range(R):
            m = mz.minimize_batch(r + (i % 2), l, K, W)
            h, p, k2, ov = match_ops.compact_queries(
                m.hashes, m.pos, m.dedup_keep, 2048)
            acc += jnp.sum(h) + jnp.sum(k2)
        return acc

    print("backend", jax.default_backend(), f"| {R} reps")
    base = timed("floor", f_base, reads)
    t = timed("sweep only", f_sweep_only, reads, lens)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")
    t = timed("sweep+dedup", f_sweep_dedup, reads, lens)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")
    t = timed("sweep+dedup+compact", f_sweep_dedup_compact, reads, lens)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")


if __name__ == "__main__":
    main()
