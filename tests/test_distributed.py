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
def test_two_process_cli_matches_single(tmp_path):
    """The PRODUCT path: two CLI processes (4 virtual devices each), reads
    sharded per process, PAF gathered to process 0 - stdout must be
    byte-identical to the single-process run (the deterministic replacement
    for the reference's omp-critical merge, team_mapper.cpp:685)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(7)
    genome = "".join("CATG"[i] for i in rng.integers(0, 4, 2000))
    ref = tmp_path / "ref.fasta"
    ref.write_text(f">ref\n{genome}\n")
    reads_f = tmp_path / "reads.fasta"
    with open(reads_f, "w") as fh:
        for r in range(10):
            start = int(rng.integers(0, 1800))
            fh.write(f">r{r}\n{genome[start:start + 150]}\n")
    args = ["-m", "bioinfo1_tpu.cli", "-k", "9", "-w", "3",
            str(ref), str(reads_f)]

    base_env = dict(os.environ)
    base_env.pop("XLA_FLAGS", None)
    base_env.pop("JAX_COORDINATOR_ADDRESS", None)
    base_env["BIOINFO1_PLATFORM"] = "cpu"
    base_env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/bioinfo1_tpu_jax_cache"

    single = subprocess.run([sys.executable] + args, env=base_env, cwd=repo,
                            capture_output=True, text=True, timeout=420)
    assert single.returncode == 0, single.stderr

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(base_env)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable] + args, env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    def _lines(s):
        # Gloo (the CPU collectives backend) logs rank-connection notices to
        # stdout; they are library noise, not program output.
        return [l for l in s.splitlines() if not l.startswith("[Gloo]")]

    outs = []
    for p in procs:
        out, perr = p.communicate(timeout=420)
        assert p.returncode == 0, perr
        outs.append(out)
    assert _lines(outs[1]) == []                  # only process 0 writes
    assert _lines(outs[0]) == single.stdout.splitlines()


@pytest.mark.slow
def test_four_process_cli_file_output_matches_single(tmp_path):
    """Pod-shaped multi-host (VERDICT r02 item 4): FOUR CLI processes with
    -o — sharded per-process parsing, per-process part files + progress
    checkpoints, and the point-to-point merge to process 0.  The merged
    file must be byte-identical to the single-process run."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(19)
    genome = "".join("CATG"[i] for i in rng.integers(0, 4, 3000))
    ref = tmp_path / "ref.fasta"
    ref.write_text(f">ref\n{genome}\n")
    reads_f = tmp_path / "reads.fasta"
    with open(reads_f, "w") as fh:
        for r in range(14):
            start = int(rng.integers(0, 2800))
            fh.write(f">r{r}\n{genome[start:start + 160]}\n")

    base_env = dict(os.environ)
    base_env.pop("XLA_FLAGS", None)
    base_env.pop("JAX_COORDINATOR_ADDRESS", None)
    base_env["BIOINFO1_PLATFORM"] = "cpu"
    base_env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/bioinfo1_tpu_jax_cache"

    single_out = tmp_path / "single.paf"
    args1 = ["-m", "bioinfo1_tpu.cli", "-k", "9", "-w", "3", "-c",
             "-o", str(single_out), str(ref), str(reads_f)]
    single = subprocess.run([sys.executable] + args1, env=base_env, cwd=repo,
                            capture_output=True, text=True, timeout=420)
    assert single.returncode == 0, single.stderr

    multi_out = tmp_path / "multi.paf"
    args4 = ["-m", "bioinfo1_tpu.cli", "-k", "9", "-w", "3", "-c",
             "-o", str(multi_out), str(ref), str(reads_f)]
    port = _free_port()
    procs = []
    for pid in range(4):
        env = dict(base_env)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "4"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable] + args4, env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    for p in procs:
        out, perr = p.communicate(timeout=420)
        assert p.returncode == 0, perr

    assert multi_out.read_text() == single_out.read_text()
    # Sharded execution left per-process part + progress checkpoints.
    for pid in range(4):
        assert (tmp_path / f"multi.paf.part{pid}").exists()
        assert (tmp_path / f"multi.paf.progress.p{pid}").exists()
    # The parts concatenate to the merged output (deterministic order).
    parts = "".join((tmp_path / f"multi.paf.part{p}").read_text()
                    for p in range(4))
    assert parts == single_out.read_text()


@pytest.mark.slow
def test_peer_death_fails_fast_and_resumes(tmp_path):
    """Elastic failure handling (VERDICT r03 item 7): SIGKILL one of four
    processes mid-run; the survivors must fail within seconds (not the
    multi-hour merge timeout) with a message naming the part files, and a
    full --resume rerun must produce output byte-identical to an
    uninterrupted run."""
    import json
    import signal
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(23)
    genome = "".join("CATG"[i] for i in rng.integers(0, 4, 40000))
    ref = tmp_path / "ref.fasta"
    ref.write_text(f">ref\n{genome}\n")
    # Enough per-process work (60 reads x several flushes each) that the
    # SIGKILL lands while the victim is still MAPPING - small jobs finish
    # before the kill and degenerate into a plain successful run.
    reads_f = tmp_path / "reads.fasta"
    with open(reads_f, "w") as fh:
        for r in range(240):
            start = int(rng.integers(0, 38500))
            fh.write(f">r{r}\n{genome[start:start + 1200]}\n")

    base_env = dict(os.environ)
    base_env.pop("XLA_FLAGS", None)
    base_env.pop("JAX_COORDINATOR_ADDRESS", None)
    base_env["BIOINFO1_PLATFORM"] = "cpu"
    base_env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/bioinfo1_tpu_jax_cache"
    base_env["BIOINFO1_HB_INTERVAL"] = "1"
    base_env["BIOINFO1_HB_GRACE"] = "8"

    single_out = tmp_path / "single.paf"
    args1 = ["-m", "bioinfo1_tpu.cli", "-k", "9", "-w", "3",
             "--batch-size", "2", "-o", str(single_out),
             str(ref), str(reads_f)]
    single = subprocess.run([sys.executable] + args1, env=base_env, cwd=repo,
                            capture_output=True, text=True, timeout=420)
    assert single.returncode == 0, single.stderr

    multi_out = tmp_path / "multi.paf"
    args4 = ["-m", "bioinfo1_tpu.cli", "-k", "9", "-w", "3",
             "--batch-size", "2", "-o", str(multi_out),
             str(ref), str(reads_f)]

    def launch(extra=()):
        port = _free_port()
        procs = []
        for pid in range(4):
            env = dict(base_env)
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
            env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
            env["JAX_NUM_PROCESSES"] = "4"
            env["JAX_PROCESS_ID"] = str(pid)
            procs.append(subprocess.Popen(
                [sys.executable] + args4 + list(extra), env=env, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
        return procs

    procs = launch()
    # Kill process 2 as soon as it has checkpointed SOME progress but is
    # still far from done (so the resume actually exercises its part file).
    victim = 2
    prog = str(multi_out) + f".progress.p{victim}"
    deadline = time.time() + 300
    killed = False
    while time.time() < deadline:
        if procs[victim].poll() is not None:
            break                         # finished too fast - still valid
        if os.path.exists(prog):
            try:
                done = json.load(open(prog)).get("completed_reads", 0)
            except ValueError:
                continue
            if 0 < done < 40:
                procs[victim].send_signal(signal.SIGKILL)
                killed = True
                break
            if done >= 40:
                break                     # too late to kill mid-run
        time.sleep(0.02)

    outs = []
    t_kill = time.time()
    for i, p in enumerate(procs):
        out, perr = p.communicate(timeout=420)
        outs.append((p.returncode, out, perr))
    detect_s = time.time() - t_kill
    if killed:
        # Process 0 must fail fast and name the recovery path.
        rc0, _, err0 = outs[0]
        assert rc0 != 0, "process 0 should fail when a peer dies"
        assert "--resume" in err0, err0
        assert f"process {victim}" in err0, err0
        assert detect_s < 120, f"took {detect_s:.0f}s to fail"

    # Recovery: rerun all four with --resume; merged output must be exact.
    procs = launch(extra=["--resume"])
    for p in procs:
        out, perr = p.communicate(timeout=420)
        assert p.returncode == 0, perr
    assert multi_out.read_text() == single_out.read_text()


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
