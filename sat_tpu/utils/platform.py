"""CLI platform selection: honor SAT_TPU_PLATFORM / SAT_TPU_HOST_DEVICES.

The deployment env pins ``JAX_PLATFORMS=axon`` and a sitecustomize
force-registers the TPU plugin, so plain env vars cannot move a CLI run off
the chip (e.g. to caption/evaluate on a CPU box, or when the TPU relay is
unreachable).  Every CLI entry point calls :func:`apply_platform_env` before
its first jax array op:

    SAT_TPU_PLATFORM=cpu SAT_TPU_HOST_DEVICES=8 python train.py ...

``SAT_TPU_HOST_DEVICES=N`` additionally provisions an N-device virtual host
mesh (the same mechanism the test suite and ``__graft_entry__`` use), so
``--mesh_shape`` sharding works off-TPU too.  No-op when the variables are
unset — the default behavior (real chip via the plugin) is unchanged.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    platform = os.environ.get("SAT_TPU_PLATFORM")
    n_host = os.environ.get("SAT_TPU_HOST_DEVICES")
    if not platform and not n_host:
        return
    if n_host:
        flag = f"--xla_force_host_platform_device_count={int(n_host)}"
        prev = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in prev:
            os.environ["XLA_FLAGS"] = (prev + " " + flag).strip()
        platform = platform or "cpu"
    import jax

    # env vars alone are ignored under the pinned plugin; the config update
    # is what actually routes the backend choice (must precede array ops)
    jax.config.update("jax_platforms", platform)
