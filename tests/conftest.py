"""Test harness config: force an 8-device virtual CPU mesh before JAX import.

Multi-device sharding logic (gather -> advantage -> slice, pjit train steps) is
exercised on a host-platform mesh, per the TPU-less CI strategy in SURVEY.md §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
