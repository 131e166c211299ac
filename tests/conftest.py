"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before the JAX backend initializes (SURVEY.md section 4:
the TPU-native answer to testing distributed code without a cluster).
"""

import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The adaptive-band cache is perf-only cross-run state; tests assert on
# adaptation behavior (band retries, growth) and must start cold.
os.environ["BIOINFO1_BAND_CACHE"] = "0"

import jax  # noqa: E402

# The env var alone is NOT enough in this environment: the axon TPU plugin
# force-registers itself and overrides JAX_PLATFORMS, silently routing every
# op through a flaky RPC tunnel to one real chip.  The config.update call
# (before first backend use) reliably pins the virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA CPU compiles
# (~8 min cold); cached reruns take seconds.
_CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/bioinfo1_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")
ORACLE_BIN = os.path.join(REPO, "build", "reference_mapper")


def _ensure_oracle() -> str:
    """Build the reference C++ binary once per session (skip if impossible)."""
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference sources not available")
    if not os.path.exists(ORACLE_BIN):
        try:
            subprocess.run(
                [os.path.join(REPO, "tools", "build_reference_oracle.sh")],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build reference oracle: {e}")
    return ORACLE_BIN


@pytest.fixture(scope="session")
def oracle_bin() -> str:
    return _ensure_oracle()


def run_oracle(oracle_bin, args, cwd=None):
    """Run the reference binary single-threaded (deterministic output order)."""
    env = dict(os.environ, OMP_NUM_THREADS="1")
    proc = subprocess.run([oracle_bin] + args, capture_output=True,
                          text=True, env=env, cwd=cwd, timeout=600)
    return proc
