"""Worker for the multi-host scaling-efficiency measurement.

One process == one simulated host: pinned to a single CPU core by the
orchestrator (tools/measure_scaling.py), one virtual XLA CPU device, mapping
its contiguous slice of the global read set through the PRODUCT path
(pipeline.mapper.Mapper + parallel.shard.gather_lines_to_process0).

Usage: python tools/scaling_worker.py <port> <pid> <nproc> <out.json>
(port 0 => single-process mode, no jax.distributed)
"""

import json
import os
import sys
import time


def main():
    port, pid, nproc, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/bioinfo1_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if nproc > 1:
        # Env form so parallel.shard._merge_endpoint derives the p2p merge
        # port from the same coordinator address.
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                                   process_id=pid)

    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bioinfo1_tpu.parallel import shard as ps
    from bioinfo1_tpu.pipeline.mapper import Mapper, MapperConfig

    # Deterministic synthetic workload (shared by every process).
    rng = np.random.default_rng(42)
    genome = "".join("CATG"[i] for i in rng.integers(0, 4, 200_000))
    # 4096 reads = dozens of 64-read batches per process at every pow-2 (and
    # so on for pow-2 nproc): every batch shares ONE canonical jit shape, so
    # the warm-up covers everything and no compile lands in the timed region.
    n_reads, read_len = 4096, 1000
    records = []
    for r in range(n_reads):
        start = int(rng.integers(0, len(genome) - read_len))
        seq = list(genome[start:start + read_len])
        for e in rng.integers(0, read_len, read_len // 50):  # 2% errors
            seq[e] = "CATG"[int(rng.integers(0, 4))]
        records.append((f"r{r}", "".join(seq)))

    cfg = MapperConfig(batch_size=64, devices=1)
    mapper = Mapper([("ref", genome)], cfg)

    lo, hi = ps.process_read_slice(len(records))
    local = records[lo:hi]

    # Warm-up: compile every bucket shape (shared persistent cache).
    mapper.map_records(local[: cfg.batch_size])

    # Best of 3 timed repetitions (the region is sub-second; min damps OS
    # scheduling noise).  Barrier before each so processes start together.
    dt = float("inf")
    merged = None
    for _ in range(3):
        if nproc > 1:
            from jax.experimental import multihost_utils as mhu
            mhu.process_allgather(np.int32(pid))
        t0 = time.perf_counter()
        lines = mapper.map_records(local)
        merged = ps.gather_lines_to_process0(lines)
        dt = min(dt, time.perf_counter() - t0)

    if pid == 0:
        assert merged is not None and len(merged) >= n_reads * 9 // 10, \
            f"only {len(merged)} of {n_reads} reads mapped"
        with open(out_path, "w") as fh:
            json.dump({"nproc": nproc, "n_reads": n_reads,
                       "map_s": dt, "reads_per_s": n_reads / dt,
                       "mapped": len(merged)}, fh)
    print("WORKER_OK", pid, flush=True)


if __name__ == "__main__":
    main()
