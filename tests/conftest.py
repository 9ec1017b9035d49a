"""Test harness setup: force an 8-device virtual CPU platform so the suite
is deterministic, does not contend for a (single, possibly tunneled) TPU,
and multi-chip sharding tests run without TPU hardware.

Environments with an eagerly-registered TPU plugin (e.g. a sitecustomize
that pins jax_platforms at interpreter start) ignore JAX_PLATFORMS set this
late, so this uses jax.config.update — which works as long as no jax
backend has been initialized yet. XLA_FLAGS must still be set before the
CPU backend initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU platform, got "
    f"{jax.devices()[0].platform!r}")
assert len(jax.devices()) >= 8, (
    f"expected >= 8 virtual CPU devices, got {len(jax.devices())}")
