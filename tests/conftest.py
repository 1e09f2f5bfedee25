"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §7 /
dryrun_multichip contract).

Note: the environment ships a sitecustomize that registers the `axon` TPU
backend at interpreter startup, so env vars alone are not enough — the jax
config must be updated explicitly before any backend is touched.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: repeat suite runs skip LLVM entirely for
# unchanged programs, and within one run it reduces live LLVM state.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_cumulative_compile_state():
    """Clear jax's in-memory executable caches after each test module.

    The full suite compiles hundreds of programs; with round 5's added
    compile load, XLA:CPU aborted (Fatal Python error: Aborted inside
    backend_compile) partway through the suite — an LLVM-state blowup that
    no single module reproduces. Bounding live executables per module
    keeps the process healthy; the persistent cache above makes the
    resulting recompiles disk loads."""
    yield
    jax.clear_caches()
