"""Multi-host scaling-efficiency measurement (BASELINE.md target: >=80% at
>=2 hosts).

Simulates N hosts as N processes, each pinned to its own physical CPU core
(taskset) with ONE single-threaded virtual XLA CPU device - so "host"
resources are equal across configurations and the strong-scaling efficiency

    eff(N) = T(1) / (N * T(N))

is a fair number (the machine has few cores; N beyond the core count would
only measure oversubscription, so it is skipped).  Each process runs the
PRODUCT path: per-process read slice -> Mapper -> gather_lines_to_process0.

Writes SCALING.json at the repo root.  Run: python tools/measure_scaling.py
"""

import json
import os
import shutil
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "scaling_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def write_reads(tmpdir: str) -> str:
    """Deterministic shared workload file: 8,192 x 1 kb ONT-like reads
    (sized so the single-process region is ~20 s - large enough that
    eff(2) is not defined by run-to-run noise; VERDICT r03 item 6)."""
    import numpy as np
    rng = np.random.default_rng(42)
    genome = "".join("CATG"[i] for i in rng.integers(0, 4, 200_000))
    n_reads, read_len = 8192, 1000
    path = os.path.join(tmpdir, "reads.fasta")
    with open(path, "w") as fh:
        for r in range(n_reads):
            start = int(rng.integers(0, len(genome) - read_len))
            seq = list(genome[start:start + read_len])
            for e in rng.integers(0, read_len, read_len // 50):
                seq[e] = "CATG"[int(rng.integers(0, 4))]
            fh.write(f">r{r}\n{''.join(seq)}\n")
    return path


def run_config(nproc: int, tmpdir: str, reads_path: str) -> dict:
    port = _free_port() if nproc > 1 else 0
    out_path = os.path.join(tmpdir, f"scaling_{nproc}.json")
    have_taskset = shutil.which("taskset") is not None
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_COORDINATOR_ADDRESS", None)
        cmd = [sys.executable, WORKER, str(port), str(pid), str(nproc),
               reads_path, out_path]
        if have_taskset:
            cmd = ["taskset", "-c", str(pid % os.cpu_count())] + cmd
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    for p in procs:
        out, err = p.communicate(timeout=1200)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed (nproc={nproc}):\n{err}")
    with open(out_path) as fh:
        return json.load(fh)


def main():
    import tempfile
    cores = os.cpu_count() or 1
    # Always include a 4-process point even when it oversubscribes the
    # cores (VERDICT r02 item 4): its efficiency is then core-bound, but
    # its merge stage still measures the real P=4 gather-to-process-0 cost.
    # 8-process point always included (pod-ish process count): on a
    # 2-core box it is oversubscribed 4x - its efficiency is core-bound,
    # but its parse/merge stage times still measure the real P=8 costs.
    configs = sorted({1, 2, 4, 8})
    results = {}
    with tempfile.TemporaryDirectory() as tmpdir:
        reads_path = write_reads(tmpdir)
        for n in configs:
            r = run_config(n, tmpdir, reads_path)
            r["oversubscribed"] = n > cores
            results[n] = r
            print(f"nproc={n}: map {r['map_only_s']:.2f}s + merge "
                  f"{r['merge_s']:.3f}s + parse {r['parse_s']:.2f}s "
                  f"({r['reads_per_s']:.1f} reads/s)", flush=True)
    def total(r):
        return r["parse_s"] + r["map_only_s"] + r["merge_s"]
    t1 = total(results[1])
    payload = {
        "workload": "8192 x 1kb ONT-like reads vs 200kb synthetic genome, "
                    "k=15 w=5 f=0.001, product path (sliced parse + "
                    "Mapper + MergeSession gather), per-stage times",
        "method": "strong scaling, one process per simulated host, each "
                  "pinned to one physical core with one single-threaded "
                  "XLA CPU device; eff(N) = T1/(N*TN); configs with "
                  "oversubscribed=true exceed the physical cores and bound "
                  "merge overhead, not compute scaling",
        "physical_cores": cores,
        "configs": {str(n): results[n] for n in configs},
        # Efficiency over the WHOLE per-run cost (parse + map + merge):
        # map-only scaling on separate cores is ~perfect, so eff measured
        # on it alone jitters around 1.0 and reads superlinear; the
        # distribution overheads (sliced parse, merge) are the real cost
        # of adding hosts and belong in the number.
        "efficiency": {str(n): t1 / (n * total(results[n]))
                       for n in configs},
        "efficiency_map_only": {
            str(n): results[1]["map_only_s"] / (n * results[n]["map_only_s"])
            for n in configs},
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload["efficiency"]))


if __name__ == "__main__":
    main()
