"""Test configuration: run JAX on CPU with 8 virtual devices and float64.

Multi-device tests use the virtual CPU mesh — the JAX analog of the reference's
single-machine `mpirun -np N` smoke tests (SURVEY.md section 4). Must set env
before the first jax import.
"""

import os

# Hard override: the environment's sitecustomize (PYTHONPATH=/root/.axon_site)
# force-sets JAX_PLATFORMS=axon (TPU) at interpreter startup, so setdefault is
# not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
# Persistent compilation cache: XLA compiles are expensive in this environment
# (remote compile relay); cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import pathlib

import pytest

# The sitecustomize pre-imports jax, so env vars alone are ineffective;
# force the config explicitly.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference tree not available")
    return REFERENCE_ROOT
