"""JAX runtime configuration shared by the CLI, bench, and driver entry
points.

Two responsibilities:

* **Backend pinning.** ``BIOINFO1_PLATFORM=cpu|tpu|axon`` selects the JAX
  backend.  The plain ``JAX_PLATFORMS`` env var is NOT reliable here: TPU
  plugins force-register themselves and override it; only a
  ``jax.config.update`` before first backend use wins.

* **Persistent compilation cache.** The genome sweep / map-step
  specializations compile in tens of seconds on TPU but every shape is
  canonical (pow-2 buckets, fixed tile sizes), so one cache serves every
  run.  This is what makes `--load-index`-style restarts and repeated CLI
  invocations cheap - the reference re-does all its work from scratch each
  run (team_mapper.cpp:410-477); we re-do none of it.  Cache dir override:
  ``BIOINFO1_CACHE_DIR``.
"""

from __future__ import annotations

import os

_configured = False


def configure_jax() -> None:
    """Idempotent; call before the first JAX backend use."""
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    platform = os.environ.get("BIOINFO1_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return  # already configured (e.g. the test harness)
    cache_dir = os.environ.get("BIOINFO1_CACHE_DIR")
    if cache_dir is None:
        cache_dir = os.path.expanduser("~/.cache/bioinfo1_tpu/xla")
    if cache_dir:  # BIOINFO1_CACHE_DIR= (empty) disables
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except (OSError, AttributeError):
            pass  # read-only FS or older jax: run without the cache
