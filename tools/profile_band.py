#!/usr/bin/env python
"""Dev tool: banded wavefront kernel cost vs block size / band width."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

from bioinfo1_tpu.ops import pallas_band as pb  # noqa: E402

B, L = 256, 4096


def main():
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"CATG", dtype=np.uint8)
    q = bases[rng.integers(0, 4, (B, L))]
    t = np.zeros((B, 2 * L), np.uint8)
    t[:, :L] = q
    nmut = L // 50
    for i in range(B):
        pos = rng.integers(0, L, nmut)
        t[i, pos] = bases[rng.integers(0, 4, nmut)]
    qd = jax.device_put(q)
    td = jax.device_put(t)
    ql = jax.device_put(np.full((B,), L, np.int32))
    tl = jax.device_put(np.full((B,), L + 37, np.int32))
    m, n, g = jnp.int32(1), jnp.int32(-1), jnp.int32(-1)

    for block in (32, 64, 128):
        for band in (128, 256):
            @jax.jit
            def run(qd, ql, td, tl):
                out = pb.align_scores_banded(qd, ql, td, tl, m, n, g,
                                             band=band, block=block)
                return jnp.sum(out.score)

            run(qd, ql, td, tl)
            best = 1e9
            for _ in range(4):
                t0 = time.time()
                jax.device_get(run(qd, ql, td, tl))
                best = min(best, time.time() - t0)
            print(f"block={block} band={band}: {best*1e3:8.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
