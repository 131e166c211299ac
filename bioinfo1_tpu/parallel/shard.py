"""Multi-chip distribution of the fused map step.

The reference's only parallelism is an OpenMP parallel-for over reads with a
shared read-only index and a critical-section stdout merge
(team_mapper.cpp:596,685).  The TPU-native equivalent (SURVEY.md 2.2):

  * data parallelism over the read batch axis via `shard_map` on a 1-D
    `Mesh` ("data"), reads sharded, index REPLICATED per device,
  * no cross-device communication inside the step (reads are embarrassingly
    parallel); the gather of per-read outputs back to the host replaces the
    `omp critical` merge and is deterministic by construction,
  * multi-host: `jax.distributed.initialize` + per-host read sharding feeds
    the same function; outputs are fetched per host and merged in input
    order (process_allgather when a single writer is wanted).

`shard_map` (not pjit auto-sharding) is used so the per-device code is
explicitly local: XLA cannot accidentally insert collectives into the hot
loop; the only collective cost is the initial index broadcast.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bioinfo1_tpu.pipeline import device_map as dm


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), axis_names=("data",))


def replicate_index(index: dm.DeviceIndex, mesh: Mesh) -> dm.DeviceIndex:
    """Broadcast the index to every device (one-time DCN/ICI cost)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, rep), index)


def sharded_map_step(mesh: Mesh, k: int, w: int, mode: int,
                     budget: int = 512, region_cap: int = 0,
                     use_pallas: bool = False, band: int = 0):
    """Build a jitted data-parallel map step bound to ``mesh``.

    Returns fn(reads (B,L), lens (B,), index, match, mismatch, gap) with B a
    multiple of mesh size; reads/lens sharded on the batch axis, index
    replicated, outputs sharded back (fetch with jax.device_get).
    """
    shard_map = jax.shard_map

    def local_step(reads, lens, index, match, mismatch, gap):
        return dm.map_step(reads, lens, index, match, mismatch, gap,
                           k=k, w=w, mode=mode, budget=budget,
                           region_cap=region_cap, use_pallas=use_pallas,
                           band=band)

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data", None), P("data"), P(), P(), P(), P()),
        out_specs=jax.tree.map(lambda _: P("data"), dm.MapOut(
            mapped=0, is_fwd=0, q_begin=0, q_end=0, t_begin=0, t_end=0,
            score=0, overflow=0)),
        check_vma=False)
    return jax.jit(fn)


def distributed_initialize_if_needed() -> None:
    """Multi-host init (jax.distributed).  No-op in single-process runs;
    controlled by the standard JAX coordinator env vars."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
