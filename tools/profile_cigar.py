#!/usr/bin/env python
"""Dev tool: decompose the fused -c step's overhead vs score-only.

Times, on the real chip at the indel-bench shape (8 kb reads, band from the
adaptive cache), the cumulative stages of map_step_cigar:
  score   : map_step (no parents)
  parents : banded fill WITH parent packing + HBM stream, no walk
  walk    : + the device traceback walk
  pack    : + pack_codes
  fetch   : + device_get of the packed codes
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
from bioinfo1_tpu.ops import align as al      # noqa: E402
from bioinfo1_tpu.pipeline import device_map as dm  # noqa: E402
from bioinfo1_tpu.utils import simulate as sim  # noqa: E402
from tools.profile_step import bench_index    # noqa: E402

K, W = 15, 5
BUDGET = 2048


def main():
    genome, _, _ = bench.make_data()
    index = bench_index(genome.tobytes().decode("latin1"))
    didx = dm.device_index_from_host(index)
    jax.block_until_ready(didx.ref_bytes)
    rng = np.random.default_rng(7)
    B = int(os.environ.get("PB_B", "512"))
    L = int(os.environ.get("PB_L", "8192"))
    BAND = int(os.environ.get("PB_BAND", "512"))
    recs = sim.simulate_reads(genome, [L - 200] * B, rng)
    arr = np.zeros((B, L), np.uint8)
    lens = np.zeros((B,), np.int32)
    for i, (_, s) in enumerate(recs):
        b = np.frombuffer(s.encode("latin1"), np.uint8)[:L]
        arr[i, :len(b)] = b
        lens[i] = len(b)
    reads_d = jax.device_put(arr)
    lens_d = jax.device_put(lens)
    jax.block_until_ready(reads_d)
    m, n, g = jnp.int32(1), jnp.int32(-1), jnp.int32(-1)
    region_cap = 2 * L
    print(f"backend={jax.default_backend()} B={B} L={L} band={BAND}")

    from bioinfo1_tpu.ops import pallas_band as pb
    from bioinfo1_tpu.ops import trace as tr

    def core(stage):
        @jax.jit
        def f(r, l, dx):
            (mapped, use_fwd, q_begin, q_end, t_begin, t_end, overflow,
             q_win, t_win, q_len, t_len) = dm._map_core(
                r, l, dx, k=K, w=W, budget=BUDGET, region_cap=region_cap,
                use_pallas=True, oob_end_windows=False)
            if stage == "front":
                return jnp.sum(q_win) + jnp.sum(t_win) + jnp.sum(mapped)
            if stage == "score":
                out = pb.align_scores_banded(
                    q_win, q_len, t_win, t_len, m, n, g, band=BAND,
                    mode=0, dash_free=True)
                return jnp.sum(out.score)
            out = pb.align_scores_banded(
                q_win, q_len, t_win, t_len, m, n, g, band=BAND,
                want_parents=True, mode=0, dash_free=True)
            if stage == "parents":
                # touch one element per row of the parent stream
                return jnp.sum(out.score) + jnp.sum(out.parents[:, :, 0])
            codes = tr.walk_parents(
                out.parents, out.goal_i, out.goal_j, out.score,
                q_win, t_win, m, n, g, mode=0, band=BAND)
            if stage == "walk":
                return jnp.sum(out.score) + jnp.sum(codes[:, 0])
            packed = tr.pack_codes(codes)
            return jnp.sum(out.score) + jnp.sum(packed[:, 0])
        return f

    def timed(name, stage, fetch=False, nrep=3):
        f = core(stage)
        jax.device_get(f(reads_d, lens_d, didx))
        best = 1e9
        for _ in range(nrep):
            t0 = time.time()
            jax.device_get(f(reads_d, lens_d, didx))
            best = min(best, time.time() - t0)
        print(f"{name:10s} {best*1000:8.1f} ms   {B/best:8.0f} reads/s")
        return best

    timed("front", "front")
    timed("score", "score")
    timed("parents", "parents")
    timed("walk", "walk")
    timed("pack", "pack")


if __name__ == "__main__":
    main()
