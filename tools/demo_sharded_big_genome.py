#!/usr/bin/env python
"""Demonstrate the big-genome sharded-index regime END-TO-END (VERDICT r04
item 7): a synthetic >= 100 Mb genome whose replicated lookup structures
exceed the per-device budget, mapped over the 8-virtual-device CPU mesh
with hash-range auto-sharding ENGAGED (not just the dryrun), and verified
bit-identical against the replicated layout on the same reads.

Run:  python tools/demo_sharded_big_genome.py [--genome-mb 100] [--reads 64]

The per-device budget is lowered via BIOINFO1_INDEX_BUDGET so the AUTO
heuristic (pipeline/mapper._index_shard_count) itself makes the decision -
the production trigger, exercised for real.  At k=15 the replicated
footprint is dominated by the 4*(2^30+1) = 4.3 GB direct-address
directory; sharding 8 ways drops the per-device lookup bytes ~8x (the
directory is range-rebased per shard, the combined table range-sliced).

Output: a JSON summary (also written to SHARDING_DEMO.json at the repo
root) with the engaged shard count, per-device lookup bytes for both
layouts, and the replicated-vs-sharded output comparison.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax                                    # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np                            # noqa: E402


def device_bytes(didx, sharded: bool) -> int:
    """Per-device bytes of the LOOKUP structures (key/cnt/directory).
    ref_bytes is replicated in both layouts and excluded (2 bytes/base;
    it shards via the separate ref-routing lever, DESIGN.md section 18)."""
    arrs = [didx.key_hash, didx.key_pos, didx.cnt_fr, didx.cnt_r2,
            didx.bucket_off]
    total = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrs)
    # Sharded arrays carry a leading (n_shards, ...) axis: per-device cost
    # is one row.  Replicated arrays cost their full size per device.
    return total // didx.key_hash.shape[0] if sharded else total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=int, default=100)
    ap.add_argument("--reads", type=int, default=64)
    ap.add_argument("--read-len", type=int, default=4000)
    args = ap.parse_args()

    from bioinfo1_tpu.pipeline.mapper import Mapper, MapperConfig

    rng = np.random.default_rng(20260822)
    L = args.genome_mb * 1_000_000
    bases = np.frombuffer(b"CATG", dtype=np.uint8)
    print(f"building {args.genome_mb} Mb genome...", flush=True)
    genome = bases[rng.integers(0, 4, L)]
    genome_str = genome.tobytes().decode("latin1")

    records = []
    for i in range(args.reads):
        s = int(rng.integers(0, L - args.read_len))
        r = genome[s:s + args.read_len].copy()
        pos = rng.integers(0, args.read_len, args.read_len // 50)
        r[pos] = bases[rng.integers(0, 4, len(pos))]
        records.append((f"r{i}", r.tobytes().decode("latin1")))

    # --- sharded run: AUTO mode with a 1 GB per-device budget ---
    # est = n_entries*12 + 4*(2^30+1) ~ 4.3-5.5 GB replicated: exceeds the
    # budget, so _index_shard_count returns mesh.size on its own.
    os.environ["BIOINFO1_INDEX_SHARD"] = "auto"
    os.environ["BIOINFO1_INDEX_BUDGET"] = "1e9"
    t0 = time.time()
    print("building index + sharded mapper...", flush=True)
    mapper_s = Mapper([("ref", genome_str)], MapperConfig(devices=8))
    mesh = mapper_s._get_mesh()
    n_shards = mapper_s._index_shard_count(mesh)
    assert n_shards == 8, f"auto-sharding did not engage (got {n_shards})"
    t_build = time.time() - t0
    t0 = time.time()
    lines_sharded = mapper_s.map_records(records)
    t_sharded = time.time() - t0
    didx_sharded = mapper_s._replicated_index
    assert didx_sharded.shard_range, "index was not placed sharded"
    sharded_dev_bytes = device_bytes(didx_sharded, sharded=True)
    index = mapper_s.index
    n_entries = (len(index.fwd.hash_sorted) + len(index.rev.hash_sorted))
    del mapper_s, didx_sharded

    # --- replicated control on the SAME mesh (forced) ---
    os.environ["BIOINFO1_INDEX_SHARD"] = "0"
    mapper_r = Mapper([("ref", genome_str)], MapperConfig(devices=8))
    mapper_r.index = index
    t0 = time.time()
    lines_repl = mapper_r.map_records(records)
    t_repl = time.time() - t0
    repl_dev_bytes = device_bytes(mapper_r._get_device_index(),
                                  sharded=False)

    identical = lines_sharded == lines_repl
    summary = {
        "genome_mb": args.genome_mb,
        "n_reads": len(records),
        "n_index_entries": int(n_entries),
        "auto_shards_engaged": 8,
        "per_device_lookup_bytes_replicated": int(repl_dev_bytes),
        "per_device_lookup_bytes_sharded": int(sharded_dev_bytes),
        "shard_reduction_x": round(repl_dev_bytes / sharded_dev_bytes, 2),
        "mapped_sharded": len(lines_sharded),
        "output_identical_to_replicated": identical,
        "t_index_build_s": round(t_build, 1),
        "t_map_sharded_s": round(t_sharded, 2),
        "t_map_replicated_s": round(t_repl, 2),
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(REPO, "SHARDING_DEMO.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    assert identical, "sharded output differs from replicated!"
    print("OK: sharded == replicated, auto-engaged at 8 shards")


if __name__ == "__main__":
    main()
