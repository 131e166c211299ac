"""Hash-range-sharded index (BASELINE north star: "sharded across a
multi-host pod when large"): the lookup arrays (combined table +
direct-address directory) are partitioned by hash range over the mesh
devices instead of replicated, queries all_gather, counts psum, and the
disjoint per-shard hit buffers psum_scatter home - output must be
BIT-IDENTICAL to the replicated layout.

Runs on the 8-virtual-device CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _problem(n_genome=20000, n_reads=16, read_len=512, seed=3, k=9, w=3):
    from bioinfo1_tpu.index import builder
    from bioinfo1_tpu.utils import simulate as sim
    rng = np.random.default_rng(seed)
    genome = sim.repeat_genome(n_genome, rng, is_elements=6, is_len=400,
                               rrn_operons=2, rrn_len=1000,
                               tandem_loci=6, tandem_unit=60,
                               tandem_copies=5)
    genome_str = genome.tobytes().decode("latin1")
    index = builder.build_index(genome_str, k, w, 0.001)
    recs = sim.simulate_reads(genome, [read_len] * n_reads, rng)
    L = max(len(s) for _, s in recs)
    Lp = 16
    while Lp < L:
        Lp *= 2
    reads = np.zeros((n_reads, Lp), np.uint8)
    lens = np.zeros(n_reads, np.int32)
    for i, (_, s) in enumerate(recs):
        b = np.frombuffer(s.encode("latin1"), np.uint8)
        reads[i, :len(b)] = b
        lens[i] = len(b)
    return index, jnp.asarray(reads), jnp.asarray(lens), k, w


def test_sharded_index_matches_replicated():
    from bioinfo1_tpu.parallel import shard as ps
    from bioinfo1_tpu.pipeline import device_map as dm

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    index, reads, lens, k, w = _problem()
    mesh = ps.make_mesh(8)

    rep = dm.device_index_from_host(index)
    rep_d = ps.replicate_index(rep, mesh)
    shd = dm.sharded_device_index_from_host(index, 8)
    assert shd.shard_range == (1 << (2 * k)) // 8
    # Per-device lookup bytes shrink ~8x (pad skew aside).
    assert shd.bucket_off.shape == (8, shd.shard_range + 1)
    shd_d = ps.shard_index(shd, mesh)

    args = (jnp.int32(1), jnp.int32(-1), jnp.int32(-1))
    kw = dict(k=k, w=w, mode=0, budget=512, region_cap=reads.shape[1])
    step_r = ps.sharded_map_step(mesh, **kw)
    step_s = ps.sharded_map_step(mesh, **kw,
                                 index_specs=ps._index_specs(shd))
    a = jax.device_get(step_r(reads, lens, rep_d, *args))
    b = jax.device_get(step_s(reads, lens, shd_d, *args))
    for f in ("mapped", "is_fwd", "q_begin", "q_end", "t_begin", "t_end",
              "score", "overflow"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                      err_msg=f)
    assert a.mapped.sum() >= 12            # the problem actually maps


def test_sharded_index_cigar_matches_replicated():
    from bioinfo1_tpu.parallel import shard as ps
    from bioinfo1_tpu.pipeline import device_map as dm

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    index, reads, lens, k, w = _problem(n_reads=8)
    mesh = ps.make_mesh(8)
    rep_d = ps.replicate_index(dm.device_index_from_host(index), mesh)
    shd = dm.sharded_device_index_from_host(index, 8)
    shd_d = ps.shard_index(shd, mesh)
    args = (jnp.int32(1), jnp.int32(-1), jnp.int32(-1))
    kw = dict(k=k, w=w, mode=0, budget=512, region_cap=reads.shape[1],
              band=128)
    step_r = ps.sharded_map_step_cigar(mesh, **kw)
    step_s = ps.sharded_map_step_cigar(mesh, **kw,
                                       index_specs=ps._index_specs(shd))
    a = jax.device_get(step_r(reads, lens, rep_d, *args))
    b = jax.device_get(step_s(reads, lens, shd_d, *args))
    np.testing.assert_array_equal(a.base.score, b.base.score)
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.goal_i, b.goal_i)
    np.testing.assert_array_equal(a.certified, b.certified)


def test_sharded_lookup_overflow_and_counts():
    """Overflow flags and counts must match the replicated lookup exactly
    on a repeat-heavy problem with a tiny budget (the retry ladder relies
    on them)."""
    from bioinfo1_tpu.parallel import shard as ps
    from bioinfo1_tpu.pipeline import device_map as dm

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    index, reads, lens, k, w = _problem(seed=11)
    mesh = ps.make_mesh(8)
    rep_d = ps.replicate_index(dm.device_index_from_host(index), mesh)
    shd_d = ps.shard_index(
        dm.sharded_device_index_from_host(index, 8), mesh)
    args = (jnp.int32(1), jnp.int32(-1), jnp.int32(-1))
    kw = dict(k=k, w=w, mode=0, budget=64, region_cap=reads.shape[1])
    step_r = ps.sharded_map_step(mesh, **kw)
    step_s = ps.sharded_map_step(
        mesh, **kw, index_specs=ps._index_specs(
            dm.sharded_device_index_from_host(index, 8)))
    a = jax.device_get(step_r(reads, lens, rep_d, *args))
    b = jax.device_get(step_s(reads, lens, shd_d, *args))
    np.testing.assert_array_equal(a.overflow, b.overflow)
    np.testing.assert_array_equal(a.score, b.score)


def test_mapper_auto_shard_byte_equal(monkeypatch):
    """Product-level check: BIOINFO1_INDEX_SHARD=1 (or auto with a forced
    tiny budget) routes the Mapper's mesh dispatch through the sharded
    index, with output lines byte-equal to the replicated run."""
    from bioinfo1_tpu.pipeline.mapper import Mapper, MapperConfig
    from bioinfo1_tpu.utils import simulate as sim

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(5)
    genome = sim.repeat_genome(30000, rng, is_elements=6, is_len=400,
                               rrn_operons=2, rrn_len=1000,
                               tandem_loci=8, tandem_unit=60,
                               tandem_copies=5)
    genome_str = genome.tobytes().decode("latin1")
    recs = sim.simulate_reads(genome, [400] * 24, rng)
    cfg = MapperConfig(k=9, w=3, batch_size=8)

    monkeypatch.setenv("BIOINFO1_INDEX_SHARD", "0")
    want = Mapper([("ref", genome_str)], cfg).map_records(recs)
    monkeypatch.setenv("BIOINFO1_INDEX_SHARD", "1")
    m = Mapper([("ref", genome_str)], cfg)
    got = m.map_records(recs)
    assert m._replicated_index is not None and \
        m._replicated_index.shard_range > 0, "sharded path not taken"
    assert want == got
    assert sum(1 for l in want if "\t" in l) >= 20

    # auto with a forced-tiny budget must also shard.
    monkeypatch.setenv("BIOINFO1_INDEX_SHARD", "auto")
    monkeypatch.setenv("BIOINFO1_INDEX_BUDGET", "1000")
    m2 = Mapper([("ref", genome_str)], cfg)
    got2 = m2.map_records(recs)
    assert m2._replicated_index.shard_range > 0
    assert want == got2
