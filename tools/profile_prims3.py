#!/usr/bin/env python
"""Dev tool: window-extraction strategies for (B, cap) contiguous slices."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

B, CAP = 256, 8192
SRC = 8 * 1024 * 1024
R = 4


def timed(name, fn, *args, n=4):
    fn(*args)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        jax.device_get(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best * 1e3:8.2f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.integers(0, 255, SRC).astype(np.uint8))
    starts = jax.device_put(
        rng.integers(0, SRC - CAP, (B,)).astype(np.int32))
    reads = jax.device_put(
        rng.integers(0, 255, (B, 2 * CAP)).astype(np.uint8))
    rstarts = jax.device_put(
        rng.integers(0, CAP, (B,)).astype(np.int32))

    @jax.jit
    def f_base(s):
        return jnp.sum(s)

    @jax.jit
    def f_elem_gather(st):
        acc = jnp.uint32(0)
        for r in range(R):
            idx = (st[:, None] + r
                   + jnp.arange(CAP, dtype=jnp.int32)[None, :])
            acc += jnp.sum(
                jnp.take(src, jnp.clip(idx, 0, SRC - 1)).astype(jnp.uint32))
        return acc

    @jax.jit
    def f_slice_gather(st):
        acc = jnp.uint32(0)
        for r in range(R):
            out = jax.lax.gather(
                src, jnp.minimum(st + r, SRC - CAP)[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(),
                    start_index_map=(0,)),
                slice_sizes=(CAP,), mode="clip")
            acc += jnp.sum(out.astype(jnp.uint32))
        return acc

    @jax.jit
    def f_row_slice_gather(st):
        # per-row windows from a (B, L) source (the q_win case)
        acc = jnp.uint32(0)
        for r in range(R):
            starts2 = jnp.stack(
                [jnp.arange(B, dtype=jnp.int32),
                 jnp.minimum(st + r, CAP)], axis=1)
            out = jax.lax.gather(
                reads, starts2,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0, 1)),
                slice_sizes=(1, CAP), mode="clip")
            acc += jnp.sum(out.astype(jnp.uint32))
        return acc

    @jax.jit
    def f_row_elem_gather(st):
        acc = jnp.uint32(0)
        for r in range(R):
            idx = (st[:, None] + r
                   + jnp.arange(CAP, dtype=jnp.int32)[None, :])
            acc += jnp.sum(jnp.take_along_axis(
                reads, jnp.clip(idx, 0, 2 * CAP - 1), axis=1
            ).astype(jnp.uint32))
        return acc

    print("backend", jax.default_backend(), f"| {R} reps")
    base = timed("floor", f_base, starts)
    for name, fn, a in [
            ("elem gather (B,8192) from flat", f_elem_gather, starts),
            ("sliced gather Bx8192 from flat", f_slice_gather, starts),
            ("row sliced gather (B,8192)", f_row_slice_gather, rstarts),
            ("row elem take_along (B,8192)", f_row_elem_gather, rstarts)]:
        t = timed(name, fn, a)
        print(f"  -> marginal {1e3 * (t - base) / R:6.2f} ms")


if __name__ == "__main__":
    main()
