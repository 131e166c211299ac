"""Multi-process distributed mapping: 2 processes x 4 virtual CPU devices
== one 8-device global mesh, vs the single-process result.

This is the multi-host story tested without a cluster (SURVEY.md section 4d):
jax.distributed.initialize + per-process data feeding + the same shard_map'd
step used on a real pod slice.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_matches_single(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/bioinfo1_tpu_jax_cache"
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, (out, err)
        assert "WORKER_OK" in out

    # Each process holds its own half of the global batch.
    out0 = np.load(tmp_path / "out_0.npz")
    out1 = np.load(tmp_path / "out_1.npz")

    # Single-process reference on the same problem.
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from bioinfo1_tpu.pipeline import device_map as dm
    reads, lens, didx, k, w = ge._tiny_problem(batch=16)
    single = jax.device_get(dm.map_step(
        reads, lens, didx, jnp.int32(1), jnp.int32(-1), jnp.int32(-1),
        k=k, w=w, mode=0, budget=256, region_cap=reads.shape[1]))

    for field in ("mapped", "score", "q_begin", "q_end", "t_begin", "t_end"):
        merged = np.concatenate([out0[field], out1[field]])
        np.testing.assert_array_equal(
            merged, np.asarray(getattr(single, field)), err_msg=field)
