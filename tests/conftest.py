"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (the TPU analog of
the reference's real-cluster-only MPI tests, SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Prevent the axon TPU plugin (sitecustomize in /root/.axon_site) from
# dialing its remote relay during CPU-only test runs — it adds minutes to
# jax import and is irrelevant off-device.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
