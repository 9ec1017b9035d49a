"""Virtual-device provisioning for multi-chip code paths on single-chip
(or chipless) hosts.

Real multi-chip TPU slices expose their devices directly; CI and
single-chip boxes validate the SAME sharded code paths on an N-device
virtual CPU platform (``--xla_force_host_platform_device_count``). This
generalizes the reference's in-process test bed (its ghost-entry halo,
sph_neighbor_search_mex.c:282-295, is the single-process ancestor of the
mesh halo exchange) to N virtual devices.
"""

from __future__ import annotations

import os
import sys


def ensure_devices(n: int) -> None:
    """Make sure ``jax.devices()`` will report >= n devices, falling back
    to a virtual n-device CPU platform when fewer real chips are present.

    Must run BEFORE any jax backend initializes: environments with an
    eagerly-registered TPU plugin (e.g. a sitecustomize pinning
    JAX_PLATFORMS at interpreter start) ignore a late JAX_PLATFORMS env
    var, but ``jax.config.update("jax_platforms", "cpu")`` works as long
    as no backend is up yet. XLA_FLAGS must be set before the CPU backend
    initializes. Set ``SPH_DRYRUN_REAL_DEVICES`` to assert n real chips
    exist instead (e.g. a TPU pod slice).
    """
    if n <= 1:
        return
    if os.environ.get("SPH_DRYRUN_REAL_DEVICES"):
        return  # caller asserts n real chips exist
    backend_up = False
    if "jax" in sys.modules:
        import jax
        from jax._src import xla_bridge
        backend_up = bool(xla_bridge._backends)
        if backend_up and len(jax.devices()) >= n:
            return  # enough real devices already initialized
    if backend_up:
        raise RuntimeError(
            f"ensure_devices({n}): a jax backend with fewer than {n} "
            "devices is already initialized in this process; re-run in a "
            "fresh process (the virtual CPU fallback must be provisioned "
            "before backend init)")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= n, (
        f"virtual CPU provisioning failed: {len(jax.devices())} < {n}")
