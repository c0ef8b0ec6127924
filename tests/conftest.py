"""Test configuration: force an 8-virtual-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 item (e))."""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (the real TPU tunnel),
# so a plain setdefault would leave tests running on the single real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# bench.py persists per-config record bands to bench_records.json at the repo
# root; tests must never write through to the committed file
import tempfile  # noqa: E402

os.environ.setdefault(
    "SAT_TPU_BENCH_RECORDS",
    os.path.join(tempfile.mkdtemp(prefix="sat_tpu_bench_records_"),
                 "records.json"))

import jax  # noqa: E402  (import after env setup)

# The axon sitecustomize registers the TPU plugin regardless of env vars;
# force the platform choice at the config level too.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
