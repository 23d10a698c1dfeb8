"""Test configuration: force a virtual 8-device CPU mesh before JAX use.

The image's sitecustomize registers the `axon` remote-TPU PJRT plugin in every
interpreter and pins `jax.config.jax_platforms = "axon,cpu"`. Tests must run
on the local CPU backend (remote compile is ~60s/op), so we counter-update the
config here — conftest runs before any test imports, and no jax backend has
been initialized yet at this point.

This mirrors the driver's multi-chip dry-run environment
(`xla_force_host_platform_device_count=8`) so sharding tests run without
8 real chips.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
