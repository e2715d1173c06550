"""Test configuration: run everything on an 8-device virtual CPU mesh so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

# Force-override: the ambient environment pins JAX_PLATFORMS to the TPU
# plugin; tests must run on the virtual 8-device CPU mesh regardless.
# Also drop the TPU plugin's site dir from sys.path — merely registering the
# plugin intermittently contacts the TPU tunnel and can hang CPU-only runs.
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: XLA compiles on this box run on a single
# core; caching makes repeated pytest runs cheap.  (The env-var spellings are
# not honored by this jax version — set the config explicitly.)
import jax  # noqa: E402

# The env var alone is NOT enough when the ambient TPU plugin registered at
# interpreter startup (sitecustomize): the config flag wins — without this,
# `python -m pytest` in the ambient env silently runs every test over the
# TPU tunnel (slow, and MXU f32 precision breaks strict parity tolerances).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass
