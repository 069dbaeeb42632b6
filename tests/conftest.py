"""Test configuration: force CPU with 8 virtual devices.

The environment pre-imports jax (TPU plugin sitecustomize), so the env-var
route (JAX_PLATFORMS) is already latched — use jax.config.update instead.
XLA_FLAGS is read lazily at CPU-backend init, so setting it here works.

Multi-chip behavior is validated on the virtual 8-device mesh (the driver
separately dry-runs the sharded path via __graft_entry__.dryrun_multichip);
real-TPU performance is exercised by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    # `slow` marks multi-minute tests (7-min sharded-EPS compiles, cheb
    # seed sweeps, 2-process multihost): the fast default loop is
    # `pytest -m "not slow"` (~5 min); CI/driver runs the full suite.
    config.addinivalue_line(
        "markers", "slow: multi-minute test (deselect with -m 'not slow')")
