#!/usr/bin/env python
"""Dev tool: marginal-cost primitives (differenced, so the ~25 ms tunnel
dispatch floor cancels): random vs sorted gathers, sort variants."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

B, T = 256, 2048
U = 4 * 1024 * 1024
R = 8   # repeats inside one dispatch -> marginal cost per op


def timed(name, fn, *args, n=5):
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
    table = jax.device_put(rng.integers(0, 2**31, U).astype(np.uint32))
    ridx = rng.integers(0, U - 64, (B, T)).astype(np.int32)
    sidx = np.sort(ridx, axis=1)
    idx_r = jax.device_put(ridx)
    idx_s = jax.device_put(sidx)
    vals = jax.device_put(rng.integers(0, 2**31, (B, T)).astype(np.uint32))
    v2 = jax.device_put(rng.integers(0, 2**31, (B, T)).astype(np.int32))
    v3 = jax.device_put(rng.integers(0, 2**31, (B, T)).astype(np.int32))
    wide = jax.device_put(
        rng.integers(0, 2**31, (B, 2 * T)).astype(np.uint32))

    @jax.jit
    def f_base(i):
        return jnp.sum(i)

    @jax.jit
    def f_gather_r(i):
        acc = jnp.uint32(0)
        for r in range(R):
            acc += jnp.sum(jnp.take(table, (i + r) % U))
        return acc

    @jax.jit
    def f_sortx(v):
        acc = jnp.uint32(0)
        for r in range(R):
            acc += jnp.sum(jnp.sort(v + r, axis=1))
        return acc

    @jax.jit
    def f_sort_kv3(v, a, b):
        acc = jnp.uint32(0)
        for r in range(R):
            k2, a2, b2 = jax.lax.sort((v + r, a, b), num_keys=1)
            acc += jnp.sum(k2) + jnp.sum(a2).astype(jnp.uint32)
        return acc

    @jax.jit
    def f_sort_wide(v):
        acc = jnp.uint32(0)
        for r in range(R):
            acc += jnp.sum(jnp.sort(v + r, axis=1))
        return acc

    @jax.jit
    def f_scat(v):
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        acc = jnp.int32(0)
        for r in range(R):
            d = (v2 + r) % T
            acc += jnp.sum(jnp.zeros((B, T + 1), jnp.uint32)
                           .at[rows, d].set(v + r))
        return acc

    @jax.jit
    def f_cumsum(v):
        acc = jnp.uint32(0)
        for r in range(R):
            acc += jnp.sum(jnp.cumsum(v + r, axis=1))
        return acc

    print("backend", jax.default_backend(), f"| {R} reps, marginal per op")
    base = timed("dispatch floor (sum only)", f_base, idx_r)

    t = timed(f"gather 512K random x{R}", f_gather_r, idx_r)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")
    t = timed(f"gather 512K sorted x{R}", f_gather_r, idx_s)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")
    t = timed(f"sort (B,2048) x{R}", f_sortx, vals)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")
    t = timed(f"sort3 (B,2048) 1key+2val x{R}", f_sort_kv3, vals, v2, v3)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")
    t = timed(f"sort (B,4096) x{R}", f_sort_wide, wide)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")
    t = timed(f"scatter-set (B,2048) x{R}", f_scat, vals)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")
    t = timed(f"cumsum (B,2048) x{R}", f_cumsum, vals)
    print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")


if __name__ == "__main__":
    main()
