#!/usr/bin/env python
"""Dev tool: measure TPU primitive costs relevant to the match stage.

Answers: what does one 512K-element random gather / scatter / row sort /
sliced gather actually cost on this chip?  Drives the match-stage redesign.
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

B, T = 256, 2048
U = 4 * 1024 * 1024


def timed(name, fn, *args, n=5):
    fn(*args)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        jax.device_get(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best * 1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    table = jax.device_put(rng.integers(0, 2**31, U).astype(np.uint32))
    table2 = jax.device_put(
        rng.integers(0, 2**31, (U, 2)).astype(np.int32))
    idx = jax.device_put(
        rng.integers(0, U - 64, (B, T)).astype(np.int32))
    rowidx = jax.device_put(rng.integers(0, T, (B, T)).astype(np.int32))
    vals = jax.device_put(rng.integers(0, 2**31, (B, T)).astype(np.uint32))
    keys16 = jax.device_put(
        rng.integers(0, 2**31, (B, 8 * T)).astype(np.uint32))

    @jax.jit
    def f_gather(i):
        return jnp.sum(jnp.take(table, i))

    @jax.jit
    def f_gather2(i):
        r = jnp.take(table, i)
        return jnp.sum(jnp.take(table, jnp.asarray(r % U, jnp.int32)))

    @jax.jit
    def f_slice_gather8(i):
        # (B*T, 8) windows from a 1-D table via lax.gather slices.
        flat = i.reshape(-1, 1)
        out = jax.lax.gather(
            table, flat,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(8,), mode="clip")
        return jnp.sum(out)

    @jax.jit
    def f_slice_gather2d(i):
        # (B*T, 8, 2) windows from the interleaved (U, 2) table.
        flat = jnp.stack([i.reshape(-1), jnp.zeros(B * T, jnp.int32)], 1)
        out = jax.lax.gather(
            table2, flat,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(8, 2), mode="clip")
        return jnp.sum(out)

    @jax.jit
    def f_take_along(r):
        return jnp.sum(jnp.take_along_axis(vals, r, axis=1))

    @jax.jit
    def f_scatter_set(r):
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        return jnp.sum(jnp.zeros((B, T + 1), jnp.uint32)
                       .at[rows, r].set(vals))

    @jax.jit
    def f_scatter_add(r):
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        return jnp.sum(jnp.zeros((B, T + 1), jnp.int32)
                       .at[rows, r].add(1))

    @jax.jit
    def f_sort_row(v):
        return jnp.sum(jnp.sort(v, axis=1))

    @jax.jit
    def f_sort_kv(v, p):
        k2, v2 = jax.lax.sort((v, p), num_keys=1)
        return jnp.sum(k2) + jnp.sum(v2)

    @jax.jit
    def f_sort_16k(kk):
        return jnp.sum(jnp.sort(kk, axis=1))

    @jax.jit
    def f_cumsum(v):
        return jnp.sum(jnp.cumsum(v, axis=1))

    @jax.jit
    def f_searchsorted_vmap(v):
        j = jnp.arange(T, dtype=jnp.uint32)
        return jnp.sum(jax.vmap(
            lambda c: jnp.searchsorted(c, j, side="right"))(v))

    print("backend", jax.default_backend())
    timed("gather 512K from 4M", f_gather, idx)
    timed("2 chained gathers", f_gather2, idx)
    timed("sliced gather 512Kx8 (1D)", f_slice_gather8, idx)
    timed("sliced gather 512Kx8x2 (interleaved)", f_slice_gather2d, idx)
    timed("take_along_axis (B,T)", f_take_along, rowidx)
    timed("scatter-set (B,T)", f_scatter_set, rowidx)
    timed("scatter-add (B,T)", f_scatter_add, rowidx)
    timed("sort (B,2048) 1 key", f_sort_row, vals)
    timed("sort (B,2048) key+val", f_sort_kv, vals, rowidx)
    timed("sort (B,16384) 1 key", f_sort_16k, keys16)
    timed("cumsum (B,2048)", f_cumsum, vals)
    timed("vmapped searchsorted (B,T)x(T)", f_searchsorted_vmap, vals)


if __name__ == "__main__":
    main()
