"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on host devices (jax.sharding semantics are platform-independent).
"""

import os

# FORCE cpu: the harness environment pins JAX_PLATFORMS=axon (the tunneled
# TPU); tests must run on the virtual 8-device CPU mesh, never the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: XLA-CPU compiles of the render graphs take
# minutes; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/focnerf_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

# the axon sitecustomize force-selects jax_platforms="axon,cpu" through
# jax.config (which beats the env var) — override it back to cpu here.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
