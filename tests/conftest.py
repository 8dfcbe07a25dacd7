"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on this virtual mesh; the driver separately
dry-runs the multichip path (see __graft_entry__.py)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The full tier compiles several hundred XLA:CPU programs into one
    process; past ~190 tests the CPU client's JIT state can segfault on the
    NEXT compile (observed twice at the same point, while the same module
    passes solo — an upstream XLA:CPU issue, not a framework bug).  Bounding
    the number of live executables per module avoids it and caps suite RSS;
    module-scoped engine fixtures simply recompile on first use, which they
    already do from cold."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
