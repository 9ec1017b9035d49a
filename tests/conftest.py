"""Test harness setup: force an 8-device virtual CPU platform so the suite
is deterministic, does not contend for the (single, tunneled) TPU, and
multi-chip sharding tests run without TPU hardware.

Must run before the first jax backend initialization. Note the environment
may pre-set JAX_PLATFORMS (e.g. to a TPU plugin) via sitecustomize, so this
assigns unconditionally rather than setdefault."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
