"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests must be deterministic and runnable without TPU hardware; multi-chip
sharding tests use the 8 virtual CPU devices (see SURVEY §7 step 8).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize registers an experimental remote-TPU PJRT plugin
# and pins JAX_PLATFORMS=axon; the env var alone cannot override it, but the
# config update works as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall clock is dominated by
# compiles of the big render executables (~2/3 of a cold 51-minute run);
# with the disk cache a re-run drops to the actual compute.  Keyed by HLO
# hash, so code changes invalidate exactly the affected programs.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_state():
    """Drop in-process jit caches after each test MODULE.

    A full-suite process otherwise accumulates every module's live
    executables; near the end of the r4 suite a fresh XLA compile
    aborted (SIGABRT inside backend_compile_and_load) in exactly that
    high-water state while the same test compiles fine in a fresh
    process.  Per-module clearing keeps intra-module jit reuse (the
    fixtures that matter) and the persistent disk cache makes the
    cross-module recompiles cheap loads instead of real compiles.
    """
    yield
    jax.clear_caches()
